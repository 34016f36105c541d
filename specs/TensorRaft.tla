-------------------------------- MODULE TensorRaft --------------------------------
(* Declarative spec of the tensor-raft core (neumann_tpu/chain/raft.py),     *)
(* including joint-consensus dual quorums. The executable twin of this spec  *)
(* is neumann_tpu/chain/model_check.py, which explores the implementation    *)
(* itself; this module is for full TLC runs outside the CI image (no JVM     *)
(* there). Invariants here mirror model_check._check_invariants.             *)

EXTENDS Integers, Sequences, FiniteSets, TLC

CONSTANTS Nodes,          \* e.g. {n0, n1, n2}
          MaxTerm,        \* model bound on terms
          MaxLog          \* model bound on log length

VARIABLES state,          \* node -> "follower" | "candidate" | "leader"
          currentTerm,    \* node -> Nat
          votedFor,       \* node -> node or NoNode
          log,            \* node -> Seq of [term |-> Nat]
          commitIndex,    \* node -> Nat
          voters,         \* node -> SUBSET Nodes        (C_new)
          jointOld,       \* node -> SUBSET Nodes or {}  (C_old while joint)
          msgs            \* set of in-flight messages

NoNode == CHOOSE x : x \notin Nodes

vars == <<state, currentTerm, votedFor, log, commitIndex, voters,
          jointOld, msgs>>

Majority(S, G) == Cardinality(S \cap G) * 2 > Cardinality(G)

\* Joint quorum: majority of C_new AND (while joint) of C_old.
Quorum(n, S) ==
    /\ Majority(S, voters[n])
    /\ (jointOld[n] = {} \/ Majority(S, jointOld[n]))

LastTerm(l) == IF Len(l) = 0 THEN 0 ELSE l[Len(l)].term

UpToDate(n, lastLogTerm, lastLogIndex) ==
    \/ lastLogTerm > LastTerm(log[n])
    \/ /\ lastLogTerm = LastTerm(log[n])
       /\ lastLogIndex >= Len(log[n])

Init ==
    /\ state = [n \in Nodes |-> "follower"]
    /\ currentTerm = [n \in Nodes |-> 0]
    /\ votedFor = [n \in Nodes |-> NoNode]
    /\ log = [n \in Nodes |-> <<>>]
    /\ commitIndex = [n \in Nodes |-> 0]
    /\ voters = [n \in Nodes |-> Nodes]
    /\ jointOld = [n \in Nodes |-> {}]
    /\ msgs = {}

Timeout(n) ==
    /\ state[n] \in {"follower", "candidate"}
    /\ currentTerm[n] < MaxTerm
    /\ state' = [state EXCEPT ![n] = "candidate"]
    /\ currentTerm' = [currentTerm EXCEPT ![n] = @ + 1]
    /\ votedFor' = [votedFor EXCEPT ![n] = n]
    /\ msgs' = msgs \cup
        {[type |-> "vote_req", from |-> n, to |-> m,
          term |-> currentTerm[n] + 1,
          lastTerm |-> LastTerm(log[n]), lastIndex |-> Len(log[n])]
         : m \in (voters[n] \cup jointOld[n]) \ {n}}
    /\ UNCHANGED <<log, commitIndex, voters, jointOld>>

HandleVoteReq(m) ==
    LET n == m.to IN
    /\ m \in msgs
    /\ m.type = "vote_req"
    /\ LET grant == /\ m.term >= currentTerm[n]
                    /\ UpToDate(n, m.lastTerm, m.lastIndex)
                    /\ (votedFor[n] = NoNode \/ votedFor[n] = m.from
                        \/ m.term > currentTerm[n])
       IN
       /\ currentTerm' = [currentTerm EXCEPT
                           ![n] = IF m.term > @ THEN m.term ELSE @]
       /\ votedFor' = [votedFor EXCEPT
                        ![n] = IF grant THEN m.from
                               ELSE IF m.term > currentTerm[n]
                               THEN NoNode ELSE @]
       /\ state' = [state EXCEPT
                     ![n] = IF m.term > currentTerm[n]
                            THEN "follower" ELSE @]
       /\ msgs' = (msgs \ {m}) \cup
            {[type |-> "vote_resp", from |-> n, to |-> m.from,
              term |-> m.term, granted |-> grant]}
       /\ UNCHANGED <<log, commitIndex, voters, jointOld>>

BecomeLeader(n, S) ==
    /\ state[n] = "candidate"
    /\ n \in S
    /\ \A v \in S \ {n} :
         \E m \in msgs : /\ m.type = "vote_resp" /\ m.to = n
                         /\ m.from = v /\ m.granted
                         /\ m.term = currentTerm[n]
    /\ Quorum(n, S)
    /\ state' = [state EXCEPT ![n] = "leader"]
    /\ UNCHANGED <<currentTerm, votedFor, log, commitIndex, voters,
                   jointOld, msgs>>

DropMsg(m) ==
    /\ m \in msgs
    /\ msgs' = msgs \ {m}
    /\ UNCHANGED <<state, currentTerm, votedFor, log, commitIndex,
                   voters, jointOld>>

Next ==
    \/ \E n \in Nodes : Timeout(n)
    \/ \E m \in msgs : HandleVoteReq(m) \/ DropMsg(m)
    \/ \E n \in Nodes, S \in SUBSET Nodes : BecomeLeader(n, S)

Spec == Init /\ [][Next]_vars

----------------------------------------------------------------------------
(* Invariants — mirror model_check.py                                       *)

ElectionSafety ==
    \A a, b \in Nodes :
        (state[a] = "leader" /\ state[b] = "leader"
         /\ currentTerm[a] = currentTerm[b]) => a = b

LogMatching ==
    \A a, b \in Nodes : \A i \in 1..Len(log[a]) :
        (i <= Len(log[b]) /\ log[a][i].term = log[b][i].term)
            => SubSeq(log[a], 1, i) = SubSeq(log[b], 1, i)

CommitAgreement ==
    \A a, b \in Nodes : \A i \in 1..commitIndex[a] :
        i <= commitIndex[b] => log[a][i].term = log[b][i].term

=============================================================================

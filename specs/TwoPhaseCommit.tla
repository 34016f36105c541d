---------------------------- MODULE TwoPhaseCommit ----------------------------
(* Declarative spec of the hardened 2PC (neumann_tpu/chain/two_phase.py):  *)
(* presumed-abort coordinator with a durable decision log, retried        *)
(* decision broadcast, coordinator crash + WAL recovery, and participants *)
(* that may vote no. The executable twin is model_check.check_two_phase,  *)
(* which explores the implementation itself (no JVM in the CI image);     *)
(* this module is for full TLC runs. Mirrors the reference's             *)
(* specs/tla/TwoPhaseCommit.tla capability (2.3M states checked there).  *)

EXTENDS Integers, FiniteSets, TLC

CONSTANTS Participants          \* e.g. {p0, p1}

VARIABLES cstate,               \* "preparing"|"committed"|"aborted"|"crashed"
          clog,                 \* durable decision: "none"|"commit"|"abort"
          pstate,               \* participant -> "working"|"prepared"
                                \*   |"committed"|"aborted"
          msgs                  \* set of in-flight messages

vars == <<cstate, clog, pstate, msgs>>

Init ==
    /\ cstate = "preparing"
    /\ clog = "none"
    /\ pstate = [p \in Participants |-> "working"]
    /\ msgs = {[type |-> "prepare", to |-> p] : p \in Participants}

\* Participant handles prepare: votes yes (locks held) or no.
VoteYes(p) ==
    /\ [type |-> "prepare", to |-> p] \in msgs
    /\ pstate[p] = "working"
    /\ pstate' = [pstate EXCEPT ![p] = "prepared"]
    /\ msgs' = msgs \cup {[type |-> "yes", from |-> p]}
    /\ UNCHANGED <<cstate, clog>>

VoteNo(p) ==
    /\ [type |-> "prepare", to |-> p] \in msgs
    /\ pstate[p] = "working"
    /\ pstate' = [pstate EXCEPT ![p] = "aborted"]
    /\ msgs' = msgs \cup {[type |-> "no", from |-> p]}
    /\ UNCHANGED <<cstate, clog>>

\* Coordinator collects yes votes; commit is logged BEFORE broadcast.
Commit ==
    /\ cstate = "preparing"
    /\ \A p \in Participants : [type |-> "yes", from |-> p] \in msgs
    /\ clog' = "commit"
    /\ cstate' = "committed"
    /\ msgs' = msgs \cup {[type |-> "commit", to |-> p]
                          : p \in Participants}
    /\ UNCHANGED pstate

\* A no-vote or a timeout aborts (presumed abort logs first too).
Abort ==
    /\ cstate = "preparing"
    /\ \/ \E p \in Participants : [type |-> "no", from |-> p] \in msgs
       \/ TRUE                   \* timeout may fire at any time
    /\ clog' = "abort"
    /\ cstate' = "aborted"
    /\ msgs' = msgs \cup {[type |-> "abort", to |-> p]
                          : p \in Participants}
    /\ UNCHANGED pstate

\* Decision retries: a decided coordinator may re-broadcast forever.
Retry ==
    /\ cstate \in {"committed", "aborted"}
    /\ msgs' = msgs \cup
        {[type |-> IF cstate = "committed" THEN "commit" ELSE "abort",
          to |-> p] : p \in Participants}
    /\ UNCHANGED <<cstate, clog, pstate>>

\* Coordinator crash wipes volatile state; only clog survives.
Crash ==
    /\ cstate # "crashed"
    /\ cstate' = "crashed"
    /\ UNCHANGED <<clog, pstate, msgs>>

\* Recovery: decided -> re-broadcast; undecided -> PRESUMED ABORT.
Recover ==
    /\ cstate = "crashed"
    /\ \/ /\ clog = "commit"
          /\ cstate' = "committed"
          /\ clog' = clog
          /\ msgs' = msgs \cup {[type |-> "commit", to |-> p]
                                : p \in Participants}
       \/ /\ clog = "abort"
          /\ cstate' = "aborted"
          /\ clog' = clog
          /\ msgs' = msgs \cup {[type |-> "abort", to |-> p]
                                : p \in Participants}
       \/ /\ clog = "none"
          /\ cstate' = "aborted"
          /\ clog' = "abort"
          /\ msgs' = msgs \cup {[type |-> "abort", to |-> p]
                                : p \in Participants}
    /\ UNCHANGED pstate

\* Participant applies a decision. A late prepare cannot resurrect a
\* decided participant (two_phase.py _decided memory).
DoCommit(p) ==
    /\ [type |-> "commit", to |-> p] \in msgs
    /\ pstate[p] = "prepared"
    /\ pstate' = [pstate EXCEPT ![p] = "committed"]
    /\ UNCHANGED <<cstate, clog, msgs>>

DoAbort(p) ==
    /\ [type |-> "abort", to |-> p] \in msgs
    /\ pstate[p] \in {"working", "prepared"}
    /\ pstate' = [pstate EXCEPT ![p] = "aborted"]
    /\ UNCHANGED <<cstate, clog, msgs>>

Next ==
    \/ \E p \in Participants :
        VoteYes(p) \/ VoteNo(p) \/ DoCommit(p) \/ DoAbort(p)
    \/ Commit \/ Abort \/ Retry \/ Crash \/ Recover

Spec == Init /\ [][Next]_vars

--------------------------------------------------------------------------
(* Invariants *)

\* AC1 (atomicity): no participant commits while another aborts.
Atomicity ==
    ~\E p, q \in Participants :
        pstate[p] = "committed" /\ pstate[q] = "aborted"

\* AC2: a participant only commits after the coordinator durably
\* logged commit.
CommitNeedsLog ==
    (\E p \in Participants : pstate[p] = "committed")
        => clog = "commit"

\* AC3: commit is only logged with unanimous yes votes.
CommitNeedsVotes ==
    clog = "commit" =>
        \A p \in Participants : [type |-> "yes", from |-> p] \in msgs

\* The decision never flips once logged.
DecisionStable ==
    /\ (cstate = "committed" => clog = "commit")
    /\ (cstate = "aborted" => clog = "abort")

==========================================================================

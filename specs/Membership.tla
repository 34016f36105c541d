------------------------------ MODULE Membership ------------------------------
(* Declarative spec of SWIM-style membership with incarnation-number       *)
(* refutation and LWW dissemination (neumann_tpu/chain/gossip.py).         *)
(* Mirrors the reference's specs/tla/Membership.tla capability. The       *)
(* executable twin is model_check.check_membership.                        *)
(*                                                                         *)
(* Model: each node keeps a view of every member as (status, incarnation). *)
(* Rumors spread by copying view entries; LWW order is (incarnation,       *)
(* status rank). A live node that sees itself suspected bumps its          *)
(* incarnation — the only way suspicion clears globally.                   *)

EXTENDS Integers, FiniteSets, TLC

CONSTANTS Nodes, MaxInc

\* status ranks: alive = 0, suspect = 1, faulty = 2
VARIABLES inc,        \* node -> its own incarnation number
          view        \* node -> node -> [st : 0..2, in : 0..MaxInc]

vars == <<inc, view>>

Fresher(a, b) ==    \* does entry a supersede entry b? (LWW order)
    \/ a.in > b.in
    \/ (a.in = b.in /\ a.st > b.st)

Init ==
    /\ inc = [n \in Nodes |-> 0]
    /\ view = [n \in Nodes |->
                [m \in Nodes |-> [st |-> 0, in |-> 0]]]

\* A failed probe: n starts suspecting m.
Suspect(n, m) ==
    /\ n # m
    /\ view[n][m].st = 0
    /\ view' = [view EXCEPT ![n][m] =
                 [st |-> 1, in |-> view[n][m].in]]
    /\ UNCHANGED inc

\* Suspicion ages out: n declares m faulty.
Fail(n, m) ==
    /\ n # m
    /\ view[n][m].st = 1
    /\ view' = [view EXCEPT ![n][m] =
                 [st |-> 2, in |-> view[n][m].in]]
    /\ UNCHANGED inc

\* Gossip: n pushes one view entry about t to m; m merges by LWW.
Gossip(n, m, t) ==
    /\ n # m /\ t # m
    /\ Fresher(view[n][t], view[m][t])
    /\ view' = [view EXCEPT ![m][t] = view[n][t]]
    /\ UNCHANGED inc

\* Refutation: m learns (via gossip, modeled directly) that some node
\* suspects it at an incarnation >= its own; it bumps and re-announces.
Refute(m) ==
    /\ \E n \in Nodes :
        /\ n # m
        /\ view[n][m].st # 0
        /\ view[n][m].in >= inc[m]
    /\ inc[m] < MaxInc
    /\ inc' = [inc EXCEPT ![m] = @ + 1]
    /\ view' = [view EXCEPT ![m][m] = [st |-> 0, in |-> inc[m] + 1]]
    /\ UNCHANGED <<>>

Next ==
    \/ \E n, m \in Nodes : Suspect(n, m) \/ Fail(n, m)
    \/ \E n, m, t \in Nodes : Gossip(n, m, t)
    \/ \E m \in Nodes : Refute(m)

Spec == Init /\ [][Next]_vars

--------------------------------------------------------------------------
(* Invariants *)

\* A node always believes itself alive (it refutes, never accepts
\* rumors about itself).
SelfAlive == \A n \in Nodes : view[n][n].st = 0

\* A node's own incarnation is the maximum anyone attributes to it:
\* nobody can forge a FRESHER rumor than the node's self-announcement.
IncarnationAuthority ==
    \A n, m \in Nodes : view[m][n].in <= inc[n]

\* After a refutation bump, stale suspicion can never override the
\* fresher alive entry (LWW order is a partial order on entries).
RefutationWins ==
    \A n, m \in Nodes :
        (view[m][n].in = inc[n] /\ view[n][n].in = inc[n])
            => ~Fresher([st |-> 1, in |-> inc[n] - 1], view[m][n])

==========================================================================

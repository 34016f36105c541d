"""Unified entities + hybrid queries (examples/unified_query.rs).

One entity = relational fields + graph edges + embedding; the hybrid
SIMILAR ... CONNECTED TO fuses the graph constraint into the device scan.
Run: python examples/unified_query.py
"""

import numpy as np

from neumann_tpu.router import QueryRouter


def main():
    r = QueryRouter()
    rng = np.random.default_rng(1)

    people = ["alice", "bob", "carol", "dave", "erin"]
    for name in people:
        emb = rng.standard_normal(32).astype(np.float32)
        vec = ", ".join(f"{x:.4f}" for x in emb)
        r.execute(f"ENTITY CREATE '{name}' "
                  f"{{ team: '{'eng' if name < 'd' else 'ops'}' }} "
                  f"EMBEDDING [{vec}]")
    r.execute("ENTITY CONNECT 'alice' -> 'bob' : works_with")
    r.execute("ENTITY CONNECT 'alice' -> 'carol' : works_with")
    r.execute("ENTITY CONNECT 'alice' -> 'dave' : works_with")

    print("alice's neighbors:", r.unified.entity_neighbors("alice"))

    # hybrid: similar to alice AND graph-connected to alice
    res = r.execute("SIMILAR 'alice' TOP 3 CONNECTED TO 'alice'")
    print("\nSIMILAR 'alice' CONNECTED TO 'alice':")
    for hit in res.results:
        print(f"  {hit['key']:>6}  {hit['score']:.4f}")

    # FIND with field predicate + similarity ordering
    rows = r.execute("FIND NODE entity WHERE team = 'eng' "
                     "SIMILAR TO 'alice' LIMIT 3").rows
    print("\nFIND entity WHERE team = 'eng' SIMILAR TO 'alice':")
    for row in rows:
        print(" ", row)


if __name__ == "__main__":
    main()

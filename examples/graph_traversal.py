"""Graph traversal + device analytics (examples/graph_traversal.rs).

Run: python examples/graph_traversal.py
"""

from neumann_tpu.router import QueryRouter
from neumann_tpu.shell import format_result


def main():
    r = QueryRouter()
    # org chart via Cypher
    r.execute("CREATE (ceo:Person { name: 'CEO' })")
    for i in range(3):
        r.execute(f"CREATE (m:Person {{ name: 'VP{i}' }})")
    for i in range(3):
        r.execute(f"MATCH (a:Person {{ name: 'VP{i}' }}), "
                  f"(b:Person {{ name: 'CEO' }}) "
                  f"CREATE (x:Person {{ name: 'IC{i}' }})")
    # direct edges through the graph language
    names = {row["p.name"]: row["p"]
             for row in r.execute("MATCH (p:Person) RETURN p, "
                                  "p.name").rows}
    for i in range(3):
        r.execute(f"EDGE CREATE {names[f'VP{i}']} -> {names['CEO']} "
                  f": reports_to")
        r.execute(f"EDGE CREATE {names[f'IC{i}']} -> {names[f'VP{i}']} "
                  f": reports_to")

    print("> NEIGHBORS of CEO (incoming)")
    print(format_result(r.execute(f"NEIGHBORS {names['CEO']} INCOMING")))

    print("\n> PATH SHORTEST IC0 -> CEO")
    print(format_result(
        r.execute(f"PATH SHORTEST {names['IC0']} TO {names['CEO']}")))

    print("\n> PAGERANK (device kernel)")
    print(format_result(r.execute("PAGERANK MAX_ITERATIONS 20")))

    print("\n> Cypher: who reports (transitively) to the CEO?")
    rows = r.execute(
        "MATCH (x:Person)-[:reports_to*1..3]->(c:Person "
        "{ name: 'CEO' }) RETURN x.name ORDER BY x.name").rows
    print([row["x.name"] for row in rows])


if __name__ == "__main__":
    main()

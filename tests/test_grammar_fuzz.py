"""Grammar-based generative fuzzing: random VALID statements.

Complements tests/test_fuzz.py (hostile garbage): here a seeded
generator emits structurally random but grammatically plausible
statements and runs them against one long-lived router. The invariant
is the reference's fuzzing-suite contract — anything may be refused
with a clean NeumannError, but nothing may raise an internal exception
or corrupt the store (checked by replaying queries after the storm).
"""

import numpy as np
import pytest

from neumann_tpu.router import QueryRouter
from neumann_tpu.utils.errors import NeumannError

TYPES = ("INT", "FLOAT", "TEXT", "BOOL")
OPS = ("=", "!=", "<", "<=", ">", ">=")


class Gen:
    def __init__(self, seed: int):
        self.rng = np.random.default_rng(seed)
        self.tables = []
        self.nodes = []
        self.keys = []

    def ident(self):
        return "t" + "".join(
            self.rng.choice(list("abcdefgh"), 3))

    def value(self, typ):
        r = self.rng
        if typ == "INT":
            return str(int(r.integers(-1000, 1000)))
        if typ == "FLOAT":
            return f"{float(r.normal()):.4f}"
        if typ == "BOOL":
            return "TRUE" if r.random() < 0.5 else "FALSE"
        s = "".join(r.choice(list("xyz' _")) for _ in range(
            int(r.integers(0, 8)))).replace("'", "''")
        return f"'{s}'"

    def condition(self, cols):
        name, typ = cols[int(self.rng.integers(0, len(cols)))]
        return f"{name} {self.rng.choice(OPS)} {self.value(typ)}"

    def expr(self, cols, depth=0):
        """Random scalar select-item expression (arith/CASE/CAST)."""
        r = self.rng
        numeric = [c for c in cols if c[1] in ("INT", "FLOAT")]
        if not numeric:
            numeric = cols
        name, typ = numeric[int(r.integers(0, len(numeric)))]
        roll = r.random()
        if depth >= 2 or roll < 0.3:
            return name
        if roll < 0.6:
            op = str(r.choice(["+", "-", "*"]))
            return (f"({self.expr(cols, depth + 1)} {op} "
                    f"{self.value('INT')})")
        if roll < 0.7:
            return (f"CASE WHEN {self.condition(cols)} THEN "
                    f"{self.value(typ)} ELSE {self.value(typ)} END")
        if roll < 0.9:
            # scalar function calls (COALESCE/ABS/ROUND/UPPER/...)
            fn = str(r.choice(["COALESCE", "NULLIF", "ABS", "ROUND",
                               "UPPER", "LOWER", "LENGTH", "TRIM",
                               "FLOOR", "CEIL"]))
            inner = self.expr(cols, depth + 1)
            if fn == "COALESCE":
                return f"COALESCE({inner}, {self.value(typ)})"
            if fn == "NULLIF":
                return f"NULLIF({inner}, {self.value(typ)})"
            if fn == "ROUND" and r.random() < 0.5:
                return f"ROUND({inner}, {int(r.integers(0, 3))})"
            return f"{fn}({inner})"
        cast_t = str(r.choice(["INT", "FLOAT", "TEXT"]))
        return f"CAST({name} AS {cast_t})"

    def statement(self):
        r = self.rng
        roll = r.random()
        if roll < 0.15 or not self.tables:
            name = self.ident()
            cols = [(f"c{i}", str(r.choice(TYPES)))
                    for i in range(int(r.integers(1, 5)))]
            self.tables.append((name, cols))
            body = ", ".join(f"{n} {t}" for n, t in cols)
            return f"CREATE TABLE {name} ({body})"
        table, cols = self.tables[int(r.integers(0, len(self.tables)))]
        if roll < 0.40:
            vals = ", ".join(self.value(t) for _, t in cols)
            return f"INSERT INTO {table} VALUES ({vals})"
        if roll < 0.49:
            return (f"SELECT * FROM {table} WHERE "
                    f"{self.condition(cols)} LIMIT "
                    f"{int(r.integers(1, 20))}")
        if roll < 0.53:
            # expression select items (arith / CASE / CAST)
            item = self.expr(cols)
            n0 = cols[0][0]
            nulls = str(r.choice(["", " NULLS FIRST", " NULLS LAST"]))
            return (f"SELECT {item} AS e, {n0} FROM {table} "
                    f"ORDER BY {n0}{nulls} LIMIT "
                    f"{int(r.integers(1, 10))}")
        if roll < 0.545:
            # aggregates, sometimes DISTINCT, sometimes grouped
            agg = str(r.choice(["COUNT", "SUM", "AVG", "MIN", "MAX"]))
            numeric = [c for c in cols if c[1] in ("INT", "FLOAT")]
            pool = cols if agg == "COUNT" else numeric
            if not pool:
                agg, pool = "COUNT", cols
            col = pool[int(r.integers(0, len(pool)))][0]
            dist = "DISTINCT " if r.random() < 0.5 else ""
            arg = "*" if agg == "COUNT" and not dist and \
                r.random() < 0.3 else col
            if r.random() < 0.5:
                g = cols[0][0]
                return (f"SELECT {g}, {agg}({dist}{arg}) FROM {table} "
                        f"GROUP BY {g}")
            return f"SELECT {agg}({dist}{arg}) FROM {table}"
        if roll < 0.55:
            # subquery forms against a random other table
            other, ocols = self.tables[int(r.integers(0,
                                                      len(self.tables)))]
            sub = f"SELECT {ocols[0][0]} FROM {other}"
            form = r.random()
            if form < 0.4:
                return (f"SELECT * FROM {table} WHERE {cols[0][0]} "
                        f"IN ({sub}) LIMIT 5")
            if form < 0.7:
                return (f"SELECT * FROM {table} WHERE EXISTS ({sub}) "
                        f"LIMIT 5")
            return (f"SELECT * FROM {table} WHERE {cols[0][0]} "
                    f"NOT IN ({sub}) LIMIT 5")
        if roll < 0.62:
            n, t = cols[int(r.integers(0, len(cols)))]
            return (f"UPDATE {table} SET {n} = {self.value(t)} "
                    f"WHERE {self.condition(cols)}")
        if roll < 0.68:
            return f"DELETE FROM {table} WHERE {self.condition(cols)}"
        if roll < 0.76:
            label = self.ident()
            self.nodes.append(label)
            return (f"NODE CREATE {label} {{v: "
                    f"{int(r.integers(0, 100))}}}")
        if roll < 0.82 and self.nodes:
            a = int(r.integers(0, 50))
            b = int(r.integers(0, 50))
            return f"EDGE CREATE {a} -> {b} : rel"
        if roll < 0.90:
            key = f"k{int(r.integers(0, 40))}"
            self.keys.append(key)
            vec = ", ".join(f"{float(x):.3f}"
                            for x in r.normal(size=4))
            return f"EMBED '{key}' [{vec}]"
        if self.keys:
            key = self.keys[int(r.integers(0, len(self.keys)))]
            metric = str(r.choice(["COSINE", "EUCLIDEAN", "DOT",
                                   "MANHATTAN", "COMPOSITE",
                                   "WEIGHTED_JACCARD", "ANGULAR",
                                   "GEODESIC", "JACCARD", "OVERLAP"]))
            return (f"SIMILAR '{key}' TOP {int(r.integers(1, 8))} "
                    f"METRIC {metric}")
        return f"SELECT COUNT(*) FROM {table}"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_grammar_fuzz_storm(seed):
    gen = Gen(seed)
    r = QueryRouter()
    executed = failed = 0
    for _ in range(400):
        stmt = gen.statement()
        try:
            r.execute(stmt)
            executed += 1
        except NeumannError:
            failed += 1  # clean refusal is fine
        # anything else (TypeError, KeyError, ...) fails the test
    assert executed > 250, (executed, failed)
    # the store survived the storm: every table still answers queries
    for table, _cols in gen.tables:
        res = r.execute(f"SELECT COUNT(*) FROM {table}")
        assert res.rows[0]["count(*)"] >= 0
    # and the device corpus is still consistent
    if gen.keys:
        hits = r.execute(f"SIMILAR '{gen.keys[-1]}' TOP 3")
        assert hits.results is not None

"""Every statement in docs/query-language.md must actually parse.

Extracts the ```sql and ```cypher blocks and runs each statement
through the real parsers, so the reference doc can never drift from
the implementation.
"""

import re

import pytest
from pathlib import Path

DOC = Path(__file__).resolve().parent.parent / "docs" / \
    "query-language.md"


def _blocks(lang: str):
    text = DOC.read_text()
    return re.findall(rf"```{lang}\n(.*?)```", text, re.S)


def _statements(block: str):
    # strip full-line and trailing comments, join continuation lines
    # (continuations are indented)
    lines = []
    for raw in block.splitlines():
        line = re.sub(r"--.*$", "", raw).rstrip()
        if not line.strip():
            continue
        if line[0].isspace() and lines:
            lines[-1] += " " + line.strip()
        else:
            lines.append(line.strip())
    return lines


def test_sql_examples_parse():
    from neumann_tpu.lang import parse

    stmts = [s for b in _blocks("sql") for s in _statements(b)]
    assert len(stmts) > 70
    failures = []
    for s in stmts:
        try:
            parse(s)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{s}\n    -> {e}")
    assert not failures, "\n".join(failures)


def test_cypher_examples_parse():
    from neumann_tpu.lang.cypher import parse_cypher

    stmts = [s for b in _blocks("cypher") for s in _statements(b)]
    assert len(stmts) >= 5
    for s in stmts:
        parse_cypher(s)


@pytest.mark.parametrize("example", [
    "basic_relational", "graph_traversal", "unified_query",
    "vector_search", "sdk_tour", "vault_security",
    "batched_throughput",
])
def test_examples_run_clean(example, capsys):
    """Every shipped example executes end-to-end without raising."""
    import runpy

    runpy.run_path(f"examples/{example}.py", run_name="__main__")


TUTORIAL = Path(__file__).resolve().parent.parent / "docs" / \
    "tutorials.md"


def test_tutorial_blocks_run():
    """Every ```python block in docs/tutorials.md executes top-to-bottom
    in one shared namespace — the tutorial cannot drift from the code."""
    text = TUTORIAL.read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, re.S)
    assert len(blocks) >= 5
    ns: dict = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"tutorials.md[block {i}]", "exec"), ns)
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"tutorial block {i} failed: {e}\n{block}") from e


def test_doc_files_exist_and_nonempty():
    docs = Path(__file__).resolve().parent.parent / "docs"
    for name in ("README.md", "quickstart.md", "query-language.md",
                 "data-types.md", "concepts.md", "architecture.md",
                 "operations.md", "runbooks.md", "tutorials.md",
                 "sdk-python.md", "sdk-typescript.md"):
        p = docs / name
        assert p.exists() and p.stat().st_size > 400, name

"""Query language: lexer -> recursive-descent parser -> AST.

Parity with neumann_parser (neumann_parser/src/): SQL + graph (NODE/EDGE/
NEIGHBORS/PATH/PAGERANK/GRAPH ...) + vector (EMBED/SIMILAR with TOP|LIMIT,
METRIC, IN collection, WHERE, CONNECTED TO) + unified (ENTITY/FIND) +
VAULT/CACHE/BLOB/CHECKPOINT/CHAIN/CLUSTER statements. Case-insensitive
keywords, spans on errors, zero dependencies.
"""

from neumann_tpu.lang.lexer import Token, tokenize  # noqa: F401
from neumann_tpu.lang.parser import parse, parse_many  # noqa: F401
from neumann_tpu.lang import ast  # noqa: F401

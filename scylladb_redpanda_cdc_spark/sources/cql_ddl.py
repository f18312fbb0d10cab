"""CQL ``CREATE TABLE`` DDL -> engine schema translation (A26).

The reference defines its source table in CQL (reference
scylladb_cql_statements.md:9-13: ``CREATE TABLE orders(customer_id int,
order_id int, product text, PRIMARY KEY(customer_id, order_id)) WITH
cdc = {'enabled': true}``), and every envelope schema downstream is a
projection of that DDL. A user migrating from the reference pipeline
brings CQL DDL, not StructTypes — this module is the bridge: parse the
tutorial dialect (column list, composite PRIMARY KEY with
partition-vs-clustering split, WITH options), map CQL types to Spark
types, and emit a ``StructType`` plus a per-column description the
engine's key-decode (A3) and envelope schemas can be checked against.

Deliberately a small recursive-descent-free parser for the tutorial's
dialect (the subset Scylla's own quickstart uses), not a full CQL
grammar: unsupported constructs raise with the offending text so a
silent mis-parse can never produce a wrong schema.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

#: CQL -> Spark type mapping (the subset a CDC analytics engine meets;
#: Scylla CQL types per the public CQL spec).
CQL_TO_SPARK: dict[str, T.DataType] = {
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "counter": T.LongType(),
    "varint": T.DecimalType(38, 0),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "decimal": T.DecimalType(38, 18),
    "boolean": T.BooleanType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "ascii": T.StringType(),
    "uuid": T.StringType(),
    "timeuuid": T.StringType(),
    "inet": T.StringType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "time": T.LongType(),  # nanos since midnight (CQL time has no tz)
    "blob": T.BinaryType(),
}


@dataclass(frozen=True)
class ParsedTable:
    """One parsed CREATE TABLE statement."""

    table: str
    columns: tuple[tuple[str, str], ...]  # (name, cql_type) in DDL order
    partition_key: tuple[str, ...]
    clustering_key: tuple[str, ...]
    options: dict[str, str] = field(default_factory=dict)

    def spark_schema(self) -> T.StructType:
        """The table as a Spark StructType: PK components non-nullable
        (CQL forbids null keys), regular columns nullable (CQL cells are
        individually absent-able — the Cell 3-state model, SURVEY §1.1)."""
        keys = set(self.partition_key) | set(self.clustering_key)
        return T.StructType(
            [
                T.StructField(n, CQL_TO_SPARK[c], nullable=n not in keys)
                for n, c in self.columns
            ]
        )

    def pk_role(self, col: str) -> str:
        if col in self.partition_key:
            return "partition"
        if col in self.clustering_key:
            return "clustering"
        return "regular"


_CREATE_RE = re.compile(
    r"CREATE\s+TABLE\s+(?:(?P<ks>\w+)\.)?(?P<tbl>\w+)\s*\((?P<body>.*)\)\s*"
    r"(?:WITH\s+(?P<opts>.*))?$",
    re.IGNORECASE | re.DOTALL,
)
_PK_RE = re.compile(r"PRIMARY\s+KEY\s*\((?P<pk>.*)\)", re.IGNORECASE | re.DOTALL)


def _split_top(body: str) -> list[str]:
    """Split on commas not nested inside parentheses."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


def parse_create_table(ddl: str) -> ParsedTable:
    """Parse one CREATE TABLE statement of the tutorial dialect."""
    text = ddl.strip().rstrip(";").strip()
    m = _CREATE_RE.match(text)
    if not m:
        raise ValueError(f"unsupported CQL (not a CREATE TABLE): {ddl[:80]!r}")
    body = m.group("body")
    columns: list[tuple[str, str]] = []
    partition: tuple[str, ...] = ()
    clustering: tuple[str, ...] = ()
    for part in _split_top(body):
        pk = _PK_RE.match(part)
        if pk:
            comps = _split_top(pk.group("pk"))
            # composite partition key is itself parenthesized:
            # PRIMARY KEY((a, b), c) -> partition (a,b), clustering (c)
            if comps and comps[0].startswith("("):
                partition = tuple(
                    x.strip() for x in _split_top(comps[0].strip("() "))
                )
                clustering = tuple(c.strip() for c in comps[1:])
            else:
                partition = (comps[0].strip(),) if comps else ()
                clustering = tuple(c.strip() for c in comps[1:])
            continue
        toks = part.split()
        if len(toks) < 2:
            raise ValueError(f"unsupported column clause: {part!r}")
        name, cql_type = toks[0], toks[1].lower()
        if cql_type not in CQL_TO_SPARK:
            raise ValueError(f"unsupported CQL type {cql_type!r} for {name!r}")
        if len(toks) == 4 and " ".join(toks[2:]).upper() == "PRIMARY KEY":
            partition = (name,)
        elif len(toks) > 2:
            raise ValueError(f"unsupported column clause: {part!r}")
        columns.append((name, cql_type))
    options: dict[str, str] = {}
    if m.group("opts"):
        for opt in re.split(r"\bAND\b", m.group("opts"), flags=re.IGNORECASE):
            if "=" in opt:
                k, v = opt.split("=", 1)
                options[k.strip().lower()] = v.strip()
    known = {n for n, _ in columns}
    for k in (*partition, *clustering):
        if k not in known:
            raise ValueError(f"PRIMARY KEY names unknown column {k!r}")
    return ParsedTable(
        table=m.group("tbl"),
        columns=tuple(columns),
        partition_key=partition,
        clustering_key=clustering,
        options=options,
    )


#: The reference's literal DDL (scylladb_cql_statements.md:9-13).
REFERENCE_ORDERS_DDL = """CREATE TABLE orders(
   customer_id int,
   order_id int,
   product text,
   PRIMARY KEY(customer_id, order_id)) WITH cdc = {'enabled': true}"""

"""ClickHouse ``CREATE TABLE`` DDL front end (compatibility subset).

The reference engine has no SQL DDL (its surface is a C++ API,
src/merge_tree.h); this module is extension surface for migrating users:
paste the ClickHouse DDL you run today and get a configured
``SparkMergeTree`` back. Supported subset:

    CREATE TABLE [IF NOT EXISTS] [db.]name (
        col Type [DEFAULT expr],
        ...,
        INDEX iname col TYPE minmax | set(N) | tokenbf_v1(...)
                                   | ngrambf_v1(n, ...) [GRANULARITY g],
        CONSTRAINT cname CHECK expr
    ) ENGINE = MergeTree()
             | ReplacingMergeTree([ver])
             | SummingMergeTree([(c, ...)])
             | CollapsingMergeTree(sign)
             | VersionedCollapsingMergeTree(sign, ver)
    ORDER BY (a, b) | ORDER BY a
    [PARTITION BY col]
    [SAMPLE BY col]
    [TTL col + INTERVAL n {SECOND|MINUTE|HOUR|DAY}]
    [SETTINGS k = v, ...]

Mapping notes (each is the engine's documented analog):
- ORDER BY (k, t): k -> ``key_col``, t -> ``ts_col``. A single-column
  ORDER BY sets both to it ((k,k) dedup == dedup on k).
- Types: Int8/16/32 -> int, Int64/UInt* -> bigint, Float32/64 ->
  float/double, String/FixedString -> string, Date -> date,
  DateTime[64] -> timestamp, Decimal(p,s) -> decimal(p,s), Bool ->
  boolean; Nullable(T)/LowCardinality(T) unwrap to T (parquet
  dictionary-encodes low-cardinality columns automatically).
- TTL is declared, not self-firing (the engine has no clock);
  ``SparkMergeTree.apply_declared_ttl(now)`` runs one expiry sweep —
  call it from whatever scheduler owns time (ClickHouse's own TTL also
  fires on background merges, not instantly).
- Column DEFAULTs fill omitted columns at INSERT (insert_batch), the
  ClickHouse INSERT contract.
- SETTINGS understood: parts_to_throw_insert, max_parts,
  memtable_flush_threshold, snapshot_retention, index_granularity
  (ignored — parquet row groups own granularity). Unknown settings are
  ignored, matching ClickHouse's own tolerance for older servers.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from clickhouse_mergetree_spark.engine.merge_tree import (
    MergeTreeConfig,
    SparkMergeTree,
)

_TYPE_MAP = {
    "int8": "int", "int16": "int", "int32": "int", "int64": "bigint",
    "uint8": "int", "uint16": "int", "uint32": "bigint", "uint64": "bigint",
    "float32": "float", "float64": "double",
    "string": "string", "bool": "boolean", "boolean": "boolean",
    "date": "date", "datetime": "timestamp", "datetime64": "timestamp",
}

_INTERVAL_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3_600 * 1_000_000,
    "day": 86_400 * 1_000_000,
}


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parentheses and quotes."""
    out, depth, buf, quote = [], 0, [], None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def _map_type(ch_type: str) -> str:
    t = ch_type.strip()
    # unwrap Nullable(...) / LowCardinality(...) (composable)
    m = re.fullmatch(r"(?i)(nullable|lowcardinality)\((.+)\)", t)
    while m:
        t = m.group(2).strip()
        m = re.fullmatch(r"(?i)(nullable|lowcardinality)\((.+)\)", t)
    m = re.fullmatch(r"(?i)decimal\((\d+)\s*,\s*(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"(?i)fixedstring\(\d+\)", t)
    if m:
        return "string"
    m = re.fullmatch(r"(?i)datetime64\(.*\)", t)
    if m:
        return "timestamp"
    key = t.lower()
    if key in _TYPE_MAP:
        return _TYPE_MAP[key]
    raise ValueError(f"unsupported ClickHouse type {ch_type!r}")


# ClickHouse partition-expression functions -> Spark SQL. cityHash64 maps
# to xxhash64: a DIFFERENT hash, but partition values are internal routing
# labels — any stable hash partitions equivalently (documented deviation).
_PARTITION_FN_MAP = [
    (r"(?i)toYYYYMMDD\(\s*([\w`]+)\s*\)", r"date_format(\1, 'yyyyMMdd')"),
    (r"(?i)toYYYYMM\(\s*([\w`]+)\s*\)", r"date_format(\1, 'yyyyMM')"),
    (r"(?i)toStartOfMonth\(\s*([\w`]+)\s*\)", r"date_trunc('month', \1)"),
    (r"(?i)toStartOfDay\(\s*([\w`]+)\s*\)", r"date_trunc('day', \1)"),
    (r"(?i)toMonday\(\s*([\w`]+)\s*\)", r"date_trunc('week', \1)"),
    (r"(?i)toDate\(\s*([\w`]+)\s*\)", r"to_date(\1)"),
    (r"(?i)intDiv\(\s*([\w`]+)\s*,\s*(\w+)\s*\)", r"(\1 DIV \2)"),
    (r"(?i)modulo\(\s*([\w`]+)\s*,\s*(\w+)\s*\)", r"pmod(\1, \2)"),
    (r"(?i)cityHash64\(\s*([\w`]+)\s*\)", r"xxhash64(\1)"),
]


def _translate_partition_expr(expr: str) -> str:
    out = expr
    for pat, repl in _PARTITION_FN_MAP:
        out = re.sub(pat, repl, out)
    return out.replace("`", "")


_CREATE_RE = re.compile(
    r"(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?:[\w`]+\.)?([\w`]+)\s*\((?P<body>.*)\)\s*"
    r"ENGINE\s*=\s*(?P<engine>\w+)\s*(?:\((?P<engine_args>[^)]*)\))?\s*"
    r"(?P<tail>.*?)\s*;?\s*$"
)


def parse_create_table(ddl: str) -> dict:
    """Parse the DDL into {name, fields, config_kwargs, constraints,
    defaults, ttl} — pure parsing, no Spark session needed."""
    m = _CREATE_RE.match(ddl)
    if not m:
        raise ValueError("unrecognized CREATE TABLE statement")
    name = m.group(1).strip("`")
    body, engine = m.group("body"), m.group("engine")
    engine_args = [a.strip().strip("`")
                   for a in (m.group("engine_args") or "").split(",")
                   if a.strip()]
    tail = m.group("tail")

    fields: list[tuple[str, str, bool]] = []   # (name, spark_ddl, nullable)
    defaults: dict[str, str] = {}
    indexes: list[tuple[str, str, int | None]] = []  # (col, kind, n)
    constraints: list[tuple[str, str]] = []
    enums: dict[str, dict[str, int]] = {}  # col -> label -> CH value
    ngram_n = None
    for item in _split_top_level(body):
        im = re.match(
            r"(?is)^INDEX\s+[\w`]+\s+([\w`]+)\s+TYPE\s+(\w+)"
            r"\s*(?:\(([^)]*)\))?", item)
        if im:
            col = im.group(1).strip("`")
            kind_raw = im.group(2).lower()
            args = [a.strip() for a in (im.group(3) or "").split(",")
                    if a.strip()]
            if kind_raw == "minmax":
                indexes.append((col, "minmax", None))
            elif kind_raw == "set":
                indexes.append((col, "set", int(args[0]) if args else 100))
            elif kind_raw in ("tokenbf_v1", "tokenbf"):
                indexes.append((col, "tokenbf", None))
            elif kind_raw in ("ngrambf_v1", "ngrambf"):
                indexes.append((col, "ngrambf", None))
                if args:
                    ngram_n = int(args[0])
            elif kind_raw == "bloom_filter":
                # key-column blooms are always on (enable_bloom_index);
                # non-key bloom_filter maps to the token bloom family
                indexes.append((col, "tokenbf", None))
            else:
                raise ValueError(f"unsupported index type {kind_raw!r}")
            continue
        cm = re.match(r"(?is)^CONSTRAINT\s+([\w`]+)\s+CHECK\s+(.+)$", item)
        if cm:
            constraints.append((cm.group(1).strip("`"),
                                cm.group(2).strip()))
            continue
        fm = re.match(
            r"(?is)^([\w`]+)\s+([\w()',=\-\s]+?)"
            r"(?:\s+DEFAULT\s+(.+?))?\s*$", item)
        if not fm:
            raise ValueError(f"unparsable column definition {item!r}")
        col = fm.group(1).strip("`")
        nullable = bool(re.search(r"(?i)nullable\(", fm.group(2)))
        em = re.search(r"(?i)enum(8|16)\s*\((.+)\)", fm.group(2))
        if em:
            # Enum8/16 -> string + an implicit membership CHECK: the
            # engine has no dictionary-encoded type, but the Enum
            # CONTRACT (only these labels are storable) survives as an
            # insert-time constraint — a bad label is rejected exactly
            # like CH rejects an unknown Enum value. Documented
            # deviations: (1) SHOW CREATE TABLE re-emits String + the
            # CHECK; (2) CAST(col AS Int8) is unsupported; (3) the
            # PHYSICAL part sort (when the Enum is a MergeTree ORDER BY
            # key) is lexical by label — performance-only (range-scan
            # pruning tightness), never result order. READ-side CH
            # numeric-order semantics are honored: SELECTs routed via
            # ClickHouseSession translate ORDER BY / min / max over a
            # non-lexical Enum through table_meta["enum_values"] (a
            # row-local CASE key — chsql.rewrite_enum_order), and refuse
            # loudly on shapes the rewrite can't prove safe (<, >,
            # BETWEEN over the labels; compound ORDER BY expressions).
            # the capture is greedy (Nullable(Enum8(...)) drags extra
            # trailing parens along) — truncate at the balanced close,
            # quote-aware so a ')' inside a label doesn't end the scan
            raw, depth, quote, end = em.group(2), 1, None, None
            for i, ch in enumerate(raw):
                if quote:
                    quote = None if ch == quote else quote
                elif ch in "'\"":
                    quote = ch
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            body_enum = raw[:end] if end is not None else raw
            labels = re.findall(r"'([^']*)'", body_enum)
            if not labels:
                raise ValueError(f"Enum with no labels in {item!r}")
            # CH value assignment: explicit `'x' = n` wins; otherwise
            # auto-increment from the previous value (first label = 1).
            mapping: dict[str, int] = {}
            prev = 0
            lo, hi = ((-128, 127) if em.group(1) == "8"
                      else (-32768, 32767))
            for part in _split_top_level(body_enum):
                pm = re.match(r"(?s)^\s*'([^']*)'\s*(?:=\s*(-?\d+))?\s*$",
                              part)
                if not pm:
                    raise ValueError(f"unparsable Enum item {part!r}")
                val = int(pm.group(2)) if pm.group(2) else prev + 1
                # CH rejects both at CREATE: duplicate labels and values
                # outside the Enum8/Enum16 storage type's range
                if pm.group(1) in mapping:
                    raise ValueError(
                        f"duplicate Enum label {pm.group(1)!r} in {item!r}")
                if not lo <= val <= hi:
                    raise ValueError(
                        f"Enum{em.group(1)} value {val} for label "
                        f"{pm.group(1)!r} is outside [{lo}, {hi}]")
                mapping[pm.group(1)] = val
                prev = val
            if len(set(mapping.values())) != len(mapping):
                raise ValueError(
                    f"duplicate Enum value in {item!r} "
                    f"(mapping: {mapping})")
            enums[col] = mapping
            quoted = ", ".join(f"'{label}'" for label in labels)
            pred = f"`{col}` IN ({quoted})"
            if nullable:
                pred = f"`{col}` IS NULL OR {pred}"
            constraints.append((f"enum_{col}", pred))
            fields.append((col, "string", nullable))
        else:
            fields.append((col, _map_type(fm.group(2)), nullable))
        if fm.group(3):
            defaults[col] = fm.group(3).strip()

    om = re.search(r"(?is)ORDER\s+BY\s+(\([^)]*\)|[\w`]+)", tail)
    if not om:
        raise ValueError("MergeTree DDL requires ORDER BY")
    order_cols = [c.strip().strip("`")
                  for c in om.group(1).strip("()").split(",") if c.strip()]
    key_col = order_cols[0]
    ts_col = order_cols[1] if len(order_cols) > 1 else order_cols[0]

    cfg: dict = {"key_col": key_col, "ts_col": ts_col}
    eng = engine.lower()
    if eng == "mergetree":
        pass  # reference semantics: (key, ts) dedup
    elif eng == "replacingmergetree":
        cfg["mode"] = "replacing"
        if engine_args:
            cfg["version_col"] = engine_args[0]
    elif eng == "summingmergetree":
        cfg["mode"] = "summing"
        if engine_args:
            cfg["sum_cols"] = tuple(
                a.strip("() `") for a in engine_args if a.strip("() `"))
    elif eng == "collapsingmergetree":
        cfg["mode"] = "collapsing"
        cfg["sign_col"] = engine_args[0]
    elif eng == "versionedcollapsingmergetree":
        cfg["mode"] = "versioned_collapsing"
        cfg["sign_col"], cfg["version_col"] = engine_args[:2]
    else:
        raise ValueError(f"unsupported engine {engine!r}")

    pm = re.search(
        r"(?is)PARTITION\s+BY\s+(.+?)"
        r"(?=\s+(?:ORDER|SAMPLE|TTL|SETTINGS|PRIMARY)\b|$)", tail)
    if pm:
        pexpr = pm.group(1).strip()
        if re.fullmatch(r"[\w`]+", pexpr):
            cfg["partition_col"] = pexpr.strip("`")
        else:
            cfg["partition_expr"] = _translate_partition_expr(pexpr)
    sm = re.search(r"(?is)SAMPLE\s+BY\s+([\w`]+)", tail)
    if sm:
        cfg["sample_col"] = sm.group(1).strip("`")

    ttl = None
    tm = re.search(
        r"(?is)\bTTL\s+([\w`]+)\s*\+\s*INTERVAL\s+(\d+)\s+(\w+)", tail)
    if tm:
        unit = tm.group(3).lower()
        if unit not in _INTERVAL_US:
            raise ValueError(f"unsupported TTL interval unit {unit!r}")
        ttl = {"col": tm.group(1).strip("`"),
               "interval_us": int(tm.group(2)) * _INTERVAL_US[unit]}

    setm = re.search(r"(?is)SETTINGS\s+(.+)$", tail)
    if setm:
        for kv in _split_top_level(setm.group(1)):
            k, _, v = kv.partition("=")
            k, v = k.strip().lower(), v.strip()
            if k == "parts_to_throw_insert":
                cfg["max_parts_to_throw"] = int(v)
            elif k == "max_parts":
                cfg["max_parts"] = int(v)
            elif k == "memtable_flush_threshold":
                cfg["memtable_flush_threshold"] = int(v)
            elif k == "snapshot_retention":
                cfg["snapshot_retention"] = int(v)
            # unknown settings ignored (ClickHouse tolerance)

    for col, kind, n in indexes:
        if kind == "minmax":
            cfg.setdefault("minmax_cols", ())
            cfg["minmax_cols"] += (col,)
        elif kind == "set":
            cfg.setdefault("set_index_cols", ())
            cfg["set_index_cols"] += ((col, n),)
        elif kind == "tokenbf":
            cfg.setdefault("token_bloom_cols", ())
            cfg["token_bloom_cols"] += (col,)
        elif kind == "ngrambf":
            cfg.setdefault("ngram_bloom_cols", ())
            cfg["ngram_bloom_cols"] += (col,)
    if ngram_n:
        cfg["ngram_n"] = ngram_n

    return {"name": name, "fields": fields, "config_kwargs": cfg,
            "constraints": constraints, "defaults": defaults, "ttl": ttl,
            "enums": enums}


def create_table_from_ddl(spark: SparkSession, base_path: str,
                          ddl: str) -> SparkMergeTree:
    """Create (or reopen) a SparkMergeTree from ClickHouse CREATE TABLE
    DDL. Constraints register through the normal ADD CONSTRAINT path
    (manifest-persisted); the declared row TTL and column DEFAULTs land
    in table_meta for apply_declared_ttl / insert-time fill."""
    parsed = parse_create_table(ddl)
    schema = T.StructType([
        T.StructField(n, T.StructType.fromDDL(f"`x` {t}")[0].dataType,
                      nullable or n not in (
                          parsed["config_kwargs"]["key_col"],
                          parsed["config_kwargs"]["ts_col"]))
        for n, t, nullable in parsed["fields"]])
    table = SparkMergeTree(spark, base_path, schema=schema,
                           config=MergeTreeConfig(
                               **parsed["config_kwargs"]))
    for cname, expr in parsed["constraints"]:
        if not any(c["name"] == cname for c in table.constraints()):
            table.add_constraint(cname, expr)
    dirty = False
    if parsed["ttl"] and table.manifest.table_meta.get(
            "declared_ttl") != parsed["ttl"]:
        table.manifest.table_meta["declared_ttl"] = parsed["ttl"]
        dirty = True
    if parsed["defaults"] and table.manifest.table_meta.get(
            "column_defaults") != parsed["defaults"]:
        table.manifest.table_meta["column_defaults"] = parsed["defaults"]
        dirty = True
    if parsed["enums"] and table.manifest.table_meta.get(
            "enum_values") != parsed["enums"]:
        table.manifest.table_meta["enum_values"] = parsed["enums"]
        dirty = True
    if dirty:
        table.manifest.save()
    return table


_ALTER_OPS = """\
ADD COLUMN | DROP COLUMN | RENAME COLUMN | MODIFY COLUMN | CLEAR COLUMN |
MATERIALIZE COLUMN | ADD INDEX | DROP INDEX | MATERIALIZE INDEX | ADD CONSTRAINT |
DROP CONSTRAINT | ADD PROJECTION | MATERIALIZE PROJECTION |
DROP PROJECTION | DELETE [IN PARTITION p] WHERE |
UPDATE ... [IN PARTITION p] WHERE |
DROP/DETACH/ATTACH PARTITION | FREEZE | UNFREEZE WITH NAME"""


def _literal_or_expr(text: str):
    """DEFAULT value: a bare numeric / quoted-string literal stays a
    literal; anything else is a DEFAULT expression."""
    s = text.strip()
    m = re.fullmatch(r"'(.*)'", s)
    if m:
        return m.group(1), None
    try:
        return int(s), None
    except ValueError:
        pass
    try:
        return float(s), None
    except ValueError:
        pass
    if s.upper() == "NULL":
        return None, None
    return None, s


def _execute_insert(table: SparkMergeTree, cols: str | None,
                    body: str) -> int:
    """``INSERT INTO t [(cols)] VALUES ... | SELECT ...`` — the ingest
    half of the migration surface. VALUES runs as a Spark literal
    relation; SELECT runs through the CH dialect front end (``ch_sql``:
    translation + the structural routes, against whatever views the
    session has registered) — a runbook's ``INSERT INTO t SELECT
    countIf(...) ...`` keeps its dialect. Column mapping follows
    ClickHouse: an explicit column list binds by NAME (omitted columns
    fill from their declared DEFAULTs, else are refused), no list binds
    by POSITION against the full schema. Every bound column casts to
    its declared type. Returns rows inserted."""
    import pyspark.sql.functions as F  # noqa: F811 (local, like executor)

    fields = {f.name: f for f in table.schema.fields}
    if cols is not None:
        names = [c.strip().strip("`") for c in cols.split(",") if c.strip()]
        unknown = [n for n in names if n not in fields]
        if unknown:
            raise ValueError(f"unknown INSERT columns {unknown}")
    else:
        names = [f.name for f in table.schema.fields]
    if body.upper().startswith("VALUES"):
        src = table.spark.sql(
            f"SELECT * FROM ({body}) AS v({', '.join(names)})")
    else:
        from clickhouse_mergetree_spark.chsql import ch_sql
        src = ch_sql(table.spark, body)
        if len(src.columns) != len(names):
            raise ValueError(
                f"INSERT SELECT produces {len(src.columns)} columns, "
                f"target list has {len(names)}")
        src = src.toDF(*names)  # positional binding, ClickHouse-style
    src = src.select(*[
        F.col(n).cast(fields[n].dataType).alias(n) for n in names])
    missing = [f.name for f in table.schema.fields if f.name not in names]
    defaults = table.manifest.table_meta.get("column_defaults") or {}
    short = [c for c in missing if c not in defaults]
    if short:
        raise ValueError(
            f"INSERT omits columns with no declared DEFAULT: {short}")
    n = src.count()
    table.insert_batch(src, row_count=n)
    if table.constraints():
        # CHECK constraints validate during the part write; a statement
        # INSERT must reject synchronously (ClickHouse rejects the INSERT
        # itself — and writes a part per INSERT anyway), so force the
        # flush here rather than let a violating batch sit buffered
        # until some later flush raises far from its cause.
        table.flush()
    return n


def execute_ddl(table: SparkMergeTree, sql: str) -> object:
    """Execute one ClickHouse ALTER/OPTIMIZE/TRUNCATE statement against a
    SparkMergeTree — the statement surface a migrating user's runbooks
    already contain. Each clause routes to the engine method that owns
    its contract (metadata-only ALTERs, backfills, mutations, partition
    ops); returns whatever that method returns. Supported:

        ALTER TABLE t  {ops}
        OPTIMIZE TABLE t [PARTITION v] [FINAL] [DEDUPLICATE [BY c, ...]]
        TRUNCATE TABLE t
        INSERT INTO t [(cols)] VALUES (...)[, ...]
        INSERT INTO t [(cols)] SELECT ... | WITH ... SELECT ...
    """.format(ops=_ALTER_OPS)
    from pyspark.sql import functions as F

    s = sql.strip().rstrip(";").strip()
    m = re.match(r"(?is)^TRUNCATE\s+TABLE\s+[\w`.]+$", s)
    if m:
        return table.truncate()
    m = re.match(r"(?is)^DESC(?:RIBE)?(?:\s+TABLE)?\s+[\w`.]+$", s)
    if m:
        # ClickHouse DESCRIBE TABLE: one row per column with the declared
        # type and default — a projection of system.columns (metadata
        # only, no data files touched).
        return table.system_columns().select(
            "name", "type", "default", "comment")
    m = re.match(
        r"(?is)^INSERT\s+INTO\s+[\w`.]+\s*"
        r"(?:\((?P<cols>[^)]*)\)\s*)?(?P<body>(?:VALUES|SELECT|WITH)\b.*)$",
        s)
    if m:
        return _execute_insert(table, m.group("cols"), m.group("body"))
    m = re.match(r"(?is)^OPTIMIZE\s+TABLE\s+[\w`.]+(?P<rest>.*)$", s)
    if m:
        rest = m.group("rest")
        partition = None
        pm = re.search(r"(?is)\bPARTITION\s+('[^']*'|\S+)", rest)
        if pm:
            partition = pm.group(1).strip("'")
        dm = re.search(r"(?is)DEDUPLICATE(?:\s+BY\s+(?P<by>.+))?$", rest)
        if dm:
            if partition is not None:
                raise ValueError(
                    "OPTIMIZE PARTITION ... DEDUPLICATE is not supported "
                    "(DEDUPLICATE runs table-wide)")
            by = (tuple(c.strip().strip("`")
                        for c in dm.group("by").split(","))
                  if dm.group("by") else None)
            return table.optimize_deduplicate(by=by)
        return table.optimize(
            final=bool(re.search(r"(?i)\bFINAL\b", rest)),
            partition=partition)
    m = re.match(r"(?is)^ALTER\s+TABLE\s+[\w`.]+\s+(?P<op>.+)$", s)
    if not m:
        raise ValueError(f"unrecognized statement: {sql!r}")
    op = m.group("op").strip()

    am = re.match(
        r"(?is)^ADD\s+COLUMN\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w`]+)\s+"
        r"([\w()',\s]+?)(?:\s+DEFAULT\s+(.+?))?$", op)
    if am:
        default = default_expr = None
        if am.group(3):
            default, default_expr = _literal_or_expr(am.group(3))
        return table.add_column(am.group(1).strip("`"),
                                _map_type(am.group(2)),
                                default=default, default_expr=default_expr)
    am = re.match(r"(?is)^DROP\s+COLUMN\s+(?:IF\s+EXISTS\s+)?([\w`]+)$", op)
    if am:
        return table.drop_column(am.group(1).strip("`"))
    am = re.match(
        r"(?is)^RENAME\s+COLUMN\s+([\w`]+)\s+TO\s+([\w`]+)$", op)
    if am:
        return table.rename_column(am.group(1).strip("`"),
                                   am.group(2).strip("`"))
    am = re.match(
        r"(?is)^MODIFY\s+COLUMN\s+([\w`]+)\s+([\w()',\s]+)$", op)
    if am:
        return table.modify_column(am.group(1).strip("`"),
                                   _map_type(am.group(2)))
    am = re.match(
        r"(?is)^CLEAR\s+COLUMN\s+([\w`]+)"
        r"(?:\s+IN\s+PARTITION\s+(.+))?$", op)
    if am:
        part = am.group(2)
        if part is not None:
            part = part.strip().strip("'`")
        return table.clear_column(am.group(1).strip("`"), partition=part)
    am = re.match(
        r"(?is)^ADD\s+INDEX\s+([\w`]+)\s+([\w`]+)\s+TYPE\s+(\w+)"
        r"\s*(?:\(([^)]*)\))?(?:\s+GRANULARITY\s+\d+)?$", op)
    if am:
        kind_raw = am.group(3).lower()
        args = [a.strip() for a in (am.group(4) or "").split(",")
                if a.strip()]
        kind = {"minmax": "minmax", "set": "set",
                "tokenbf_v1": "tokenbf", "tokenbf": "tokenbf",
                "ngrambf_v1": "ngrambf", "ngrambf": "ngrambf",
                "bloom_filter": "tokenbf"}.get(kind_raw)
        if kind is None:
            raise ValueError(f"unsupported index type {kind_raw!r}")
        n = int(args[0]) if (kind == "set" and args) else None
        return table.add_index(am.group(2).strip("`"), kind, n=n,
                               name=am.group(1).strip("`"))
    am = re.match(r"(?is)^DROP\s+INDEX\s+([\w`]+)$", op)
    if am:
        rec = table.index_by_name(am.group(1).strip("`"))
        return table.drop_index(rec["col"], rec["kind"])
    am = re.match(r"(?is)^MATERIALIZE\s+INDEX\s+([\w`]+)$", op)
    if am:
        rec = table.index_by_name(am.group(1).strip("`"))
        return table.materialize_index(rec["col"])
    am = re.match(r"(?is)^MATERIALIZE\s+COLUMN\s+([\w`]+)$", op)
    if am:
        return table.materialize_column(am.group(1).strip("`"))
    am = re.match(
        r"(?is)^ADD\s+CONSTRAINT\s+([\w`]+)\s+CHECK\s+(.+)$", op)
    if am:
        return table.add_constraint(am.group(1).strip("`"),
                                    am.group(2).strip())
    am = re.match(r"(?is)^DROP\s+CONSTRAINT\s+([\w`]+)$", op)
    if am:
        return table.drop_constraint(am.group(1).strip("`"))
    am = re.match(
        r"(?is)^ADD\s+PROJECTION\s+([\w`]+)\s*\(\s*SELECT\s+\*\s+"
        r"ORDER\s+BY\s+(.+?)\s*\)$", op)
    if am:
        # sort projection: SELECT * ORDER BY col[, ...]
        from clickhouse_mergetree_spark.engine.merge_tree import (
            ProjectionSpec)
        order_by = tuple(c.strip().strip("`")
                         for c in am.group(2).split(","))
        return table.add_projection(
            ProjectionSpec(am.group(1).strip("`"), (), {}, order_by))
    am = re.match(
        r"(?is)^ADD\s+PROJECTION\s+([\w`]+)\s*\(\s*SELECT\s+(.+?)"
        r"\s+GROUP\s+BY\s+(.+?)\s*\)$", op)
    if am:
        from clickhouse_mergetree_spark.engine.merge_tree import (
            ProjectionSpec)
        group_by = tuple(c.strip().strip("`")
                         for c in am.group(3).split(","))
        aggs = {}
        for sel in _split_top_level(am.group(2)):
            sel = sel.strip()
            if sel.strip("`") in group_by:
                continue
            sm = re.fullmatch(
                r"(?is)(count|sum|min|max)\s*\(\s*([\w`*]*)\s*\)"
                r"\s+AS\s+([\w`]+)", sel)
            if not sm:
                raise ValueError(
                    f"unsupported projection select item {sel!r} "
                    "(need count/sum/min/max(col) AS alias)")
            fn = sm.group(1).lower()
            src = sm.group(2).strip("`")
            if fn == "count":
                src = src if src not in ("", "*") else group_by[0]
            aggs[sm.group(3).strip("`")] = (fn, src)
        return table.add_projection(
            ProjectionSpec(am.group(1).strip("`"), group_by, aggs))
    am = re.match(r"(?is)^MATERIALIZE\s+PROJECTION\s+([\w`]+)$", op)
    if am:
        return table.materialize_projection(am.group(1).strip("`"))
    am = re.match(r"(?is)^DROP\s+PROJECTION\s+([\w`]+)$", op)
    if am:
        return table.drop_projection(am.group(1).strip("`"))
    am = re.match(
        r"(?is)^DELETE(?:\s+IN\s+PARTITION\s+(?P<part>'[^']*'|[\w`]+))?"
        r"\s+WHERE\s+(?P<pred>.+)$", op)
    if am:
        part = am.group("part")
        pred = F.expr(am.group("pred").strip())
        if part is not None:
            # ClickHouse `IN PARTITION p` both prunes (only p's parts are
            # opened) AND scopes (rows outside p never match) — the hint
            # contract of mutate() requires pred ⇒ hint, so conjoin the
            # partition predicate instead of trusting the WHERE clause.
            part = part.strip().strip("'`")
            pcol = table.config.partition_col
            if pcol is None:
                raise ValueError("IN PARTITION on an unpartitioned table")
            pred = pred & (F.col(pcol) == F.lit(part).cast(
                table.schema[pcol].dataType))
            return table.delete_where(pred, partition=part)
        return table.delete_where(pred)
    am = re.match(
        r"(?is)^UPDATE\s+(?P<assign>.+?)"
        r"(?:\s+IN\s+PARTITION\s+(?P<part>'[^']*'|[\w`]+))?"
        r"\s+WHERE\s+(?P<pred>.+)$", op)
    if am:
        assignments = {}
        for kv in _split_top_level(am.group("assign")):
            k, _, v = kv.partition("=")
            col = k.strip().strip("`")
            fld = next((f for f in table.schema.fields
                        if f.name == col), None)
            if fld is None:
                raise ValueError(f"unknown column {col!r} in UPDATE")
            assignments[col] = F.expr(v.strip()).cast(fld.dataType)
        pred = F.expr(am.group("pred").strip())
        part = am.group("part")
        if part is not None:
            part = part.strip().strip("'`")
            pcol = table.config.partition_col
            if pcol is None:
                raise ValueError("IN PARTITION on an unpartitioned table")
            pred = pred & (F.col(pcol) == F.lit(part).cast(
                table.schema[pcol].dataType))
            return table.update_where(pred, assignments, partition=part)
        return table.update_where(pred, assignments)
    am = re.match(
        r"(?is)^(DROP|DETACH|ATTACH)\s+PARTITION\s+(.+)$", op)
    if am:
        verb = am.group(1).lower()
        val = am.group(2).strip().strip("'`")
        return getattr(table, f"{verb}_partition")(val)
    am = re.match(
        r"(?is)^FREEZE(?:\s+PARTITION\s+(.+?))?"
        r"(?:\s+WITH\s+NAME\s+'?([\w-]+)'?)?$", op)
    if am:
        val = am.group(1).strip().strip("'`") if am.group(1) else None
        return table.freeze_partition(val, backup_name=am.group(2))
    am = re.match(r"(?is)^UNFREEZE\s+WITH\s+NAME\s+'?([\w-]+)'?$", op)
    if am:
        return table.unfreeze(am.group(1))
    am = re.match(
        r"(?is)^(?:MODIFY|REMOVE)\s+TTL"
        r"(?:\s+([\w`]+)\s*\+\s*INTERVAL\s+(\d+)\s+(\w+))?$", op)
    if am:
        with table._lock:
            if am.group(1) is None:  # REMOVE TTL / bare MODIFY TTL
                table.manifest.table_meta.pop("declared_ttl", None)
            else:
                unit = am.group(3).lower()
                if unit not in _INTERVAL_US:
                    raise ValueError(f"unsupported TTL unit {unit!r}")
                table.manifest.table_meta["declared_ttl"] = {
                    "col": am.group(1).strip("`"),
                    "interval_us": int(am.group(2)) * _INTERVAL_US[unit]}
            table.manifest.save()
        return None
    am = re.match(
        r"(?is)^COMMENT\s+COLUMN\s+([\w`]+)\s+'((?:[^']|'')*)'$", op)
    if am:
        return table.comment_column(
            am.group(1).strip("`"), am.group(2).replace("''", "'"))
    am = re.match(r"(?is)^MODIFY\s+SETTING\s+(.+)$", op)
    if am:
        # ALTER TABLE t MODIFY SETTING k = v[, k2 = v2 ...]
        applied = {}
        for kv in _split_top_level(am.group(1)):
            k, _, v = kv.partition("=")
            k, v = k.strip().strip("`").lower(), v.strip().strip("'")
            if k == "parts_to_throw_insert":  # ClickHouse spelling
                k = "max_parts_to_throw"
            table.modify_setting(k, v)
            applied[k] = v
        return applied
    raise ValueError(f"unsupported ALTER clause: {op!r}")


def show_create_table(table: SparkMergeTree, name: str = "t") -> str:
    """Reconstruct ClickHouse CREATE TABLE DDL from a live table — the
    ``SHOW CREATE TABLE`` analog, and the inverse of
    ``create_table_from_ddl`` (parse(show(t)) round-trips the schema and
    config). Emits the CURRENT (post-ALTER) schema; retrofit indexes and
    constraints appear as table-level clauses."""
    inv_types = {
        "int": "Int32", "bigint": "Int64", "float": "Float32",
        "double": "Float64", "string": "String", "boolean": "Bool",
        "date": "Date", "timestamp": "DateTime",
    }

    def ch_type(f: T.StructField) -> str:
        s = f.dataType.simpleString()
        m = re.fullmatch(r"decimal\((\d+),(\d+)\)", s)
        base = (f"Decimal({m.group(1)}, {m.group(2)})" if m
                else inv_types.get(s))
        if base is None:
            raise ValueError(f"type {s!r} has no ClickHouse rendering")
        cfgc = table.config
        structural = {cfgc.key_col, cfgc.ts_col}
        return base if f.name in structural or not f.nullable \
            else f"Nullable({base})"

    tm = table.manifest.table_meta
    defaults = dict(tm.get("column_defaults") or {})
    for a in tm.get("added_columns", []):
        if a.get("default_expr") is not None:
            defaults[a["name"]] = a["default_expr"]
        elif a.get("default") is not None:
            d = a["default"]
            defaults[a["name"]] = (f"'{d}'" if isinstance(d, str) else
                                   str(d))
    lines = []
    for f in table.schema.fields:
        line = f"    `{f.name}` {ch_type(f)}"
        if f.name in defaults:
            line += f" DEFAULT {defaults[f.name]}"
        lines.append(line)
    cfg = table.config
    kind_map = {"minmax": "minmax", "set": "set", "tokenbf": "tokenbf_v1",
                "ngrambf": "ngrambf_v1"}
    seen = set()
    for rec in tm.get("indexes", []):
        iname = rec.get("name") or f"{rec['kind']}_{rec['col']}"
        arg = (f"({rec['n']})" if rec["kind"] == "set" and rec.get("n")
               else "")
        lines.append(f"    INDEX {iname} `{rec['col']}` TYPE "
                     f"{kind_map[rec['kind']]}{arg}")
        seen.add((rec["col"], rec["kind"]))
    for col in cfg.minmax_cols:
        if (col, "minmax") not in seen:
            lines.append(f"    INDEX minmax_{col} `{col}` TYPE minmax")
    for col, n in cfg.set_index_cols:
        if (col, "set") not in seen:
            lines.append(f"    INDEX set_{col} `{col}` TYPE set({n})")
    for col in cfg.token_bloom_cols:
        if (col, "tokenbf") not in seen:
            lines.append(f"    INDEX tokenbf_{col} `{col}` TYPE tokenbf_v1")
    for col in cfg.ngram_bloom_cols:
        if (col, "ngrambf") not in seen:
            lines.append(
                f"    INDEX ngrambf_{col} `{col}` TYPE "
                f"ngrambf_v1({cfg.ngram_n})")
    for c in table.constraints():
        lines.append(f"    CONSTRAINT {c['name']} CHECK {c['expr']}")

    engines = {
        "dedup": "MergeTree()",
        "replacing": f"ReplacingMergeTree({cfg.version_col})",
        "summing": "SummingMergeTree(({}))".format(
            ", ".join(cfg.sum_cols or ())),
        "collapsing": f"CollapsingMergeTree({cfg.sign_col})",
        "versioned_collapsing":
            f"VersionedCollapsingMergeTree({cfg.sign_col}, "
            f"{cfg.version_col})",
        "aggregating": "AggregatingMergeTree()",
    }
    out = [f"CREATE TABLE {name} (", ",\n".join(lines), ")",
           f"ENGINE = {engines[cfg.mode]}",
           f"ORDER BY ({cfg.key_col}, {cfg.ts_col})"]
    if cfg.partition_col:
        out.append(f"PARTITION BY {cfg.partition_col}")
    elif getattr(cfg, "partition_expr", None):
        # emitted in Spark SQL form (the engine's native dialect; the
        # parser accepts it back unchanged — round-trip holds)
        out.append(f"PARTITION BY {cfg.partition_expr}")
    if cfg.sample_col:
        out.append(f"SAMPLE BY {cfg.sample_col}")
    ttl = tm.get("declared_ttl")
    if ttl:
        n_us = ttl["interval_us"]
        for unit, us in (("DAY", 86_400_000_000), ("HOUR", 3_600_000_000),
                         ("MINUTE", 60_000_000), ("SECOND", 1_000_000)):
            if n_us % us == 0:
                out.append(f"TTL {ttl['col']} + INTERVAL {n_us // us} "
                           f"{unit}")
                break
    settings = []
    if getattr(cfg, "max_parts_to_throw", 0):
        settings.append(f"parts_to_throw_insert = {cfg.max_parts_to_throw}")
    if settings:
        out.append("SETTINGS " + ", ".join(settings))
    return "\n".join(out)


_MV_RE = re.compile(
    r"(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?:[\w`]+\.)?([\w`]+)\s+"
    r"ENGINE\s*=\s*SummingMergeTree\s*(?:\([^)]*\))?\s*"
    r"ORDER\s+BY\s+(\([^)]*\)|[\w`]+)\s*"
    r"(?P<populate>POPULATE\s+)?"
    r"AS\s+SELECT\s+(?P<select>.+?)\s+FROM\s+[\w`.]+\s*"
    r"(?:GROUP\s+BY\s+(?P<group>.+?))?\s*;?\s*$"
)


def create_materialized_view_from_ddl(spark: SparkSession, src_table,
                                      target_path: str, ddl: str):
    """``CREATE MATERIALIZED VIEW mv ENGINE = SummingMergeTree() ORDER BY
    ... [POPULATE] AS SELECT <aggs> FROM src GROUP BY <cols>`` analog:
    builds the incremental-rollup MaterializedView from the literal
    ClickHouse statement and attaches it to ``src_table``. The SELECT
    body is the same restricted aggregate form projections accept
    (count/sum/min/max with aliases); the target schema derives from
    running the transform over zero rows of the source schema — Spark's
    own type derivation, never hand-built. Returns the attached view."""
    from pyspark.sql import functions as F

    from clickhouse_mergetree_spark.engine.matview import MaterializedView
    from clickhouse_mergetree_spark.engine.merge_tree import (
        MergeTreeConfig, SparkMergeTree)

    m = _MV_RE.match(ddl)
    if not m:
        raise ValueError(
            "unrecognized CREATE MATERIALIZED VIEW statement (need "
            "ENGINE = SummingMergeTree, ORDER BY, AS SELECT ... "
            "[GROUP BY ...])")
    order_cols = [c.strip().strip("`")
                  for c in m.group(2).strip("()").split(",") if c.strip()]
    group_cols = tuple(
        c.strip().strip("`")
        for c in (m.group("group") or "").split(",") if c.strip())

    items = []   # (alias, Column)
    for sel in _split_top_level(m.group("select")):
        sel = sel.strip()
        if sel.strip("`") in group_cols:
            items.append((sel.strip("`"), None))  # grouping passthrough
            continue
        sm = re.fullmatch(
            r"(?is)(count|sum|min|max)\s*\(\s*([\w`*]*)\s*\)"
            r"\s+AS\s+([\w`]+)", sel)
        if not sm:
            raise ValueError(
                f"unsupported MV select item {sel!r} "
                "(need count/sum/min/max(col) AS alias, or a GROUP BY "
                "column)")
        fn, src_col = sm.group(1).lower(), sm.group(2).strip("`")
        alias = sm.group(3).strip("`")
        if fn == "count":
            col = F.count(F.lit(1)).cast("long").alias(alias)
        else:
            col = getattr(F, fn)(src_col).alias(alias)
        items.append((alias, col))
    out_order = [a for a, _c in items]
    aggs = [c for _a, c in items if c is not None]
    if not aggs:
        raise ValueError("MV SELECT needs at least one aggregate")

    def transform(df):
        return df.groupBy(*group_cols).agg(*aggs).select(*out_order)

    # Spark derives the target schema from the transform itself
    empty = spark.createDataFrame([], src_table.schema)
    tgt_schema = transform(empty).schema
    missing = [c for c in order_cols if c not in tgt_schema.names]
    if missing:
        raise ValueError(
            f"ORDER BY columns {missing} absent from the SELECT output")
    key_col = order_cols[0]
    ts_col = order_cols[1] if len(order_cols) > 1 else order_cols[0]
    view = MaterializedView(
        SparkMergeTree(spark, target_path, schema=tgt_schema,
                       config=MergeTreeConfig(
                           memtable_flush_threshold=10**12,
                           mode="summing",
                           key_col=key_col, ts_col=ts_col)),
        transform)
    src_table.attach_view(view, populate=bool(m.group("populate")))
    return view

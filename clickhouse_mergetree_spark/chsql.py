"""ClickHouse SELECT-dialect front end: translate a CH-dialect query to
Spark SQL and run it via ``spark.sql``.

The reference engine's query surface is a C++ API, but every migrating
user's notebooks and dashboards hold ClickHouse SQL. ``create_table_from_ddl``
(engine/ddl.py) already accepts their CREATE/ALTER statements; this module
covers the SELECT side for the dialect subset that translates 1:1 onto
Spark SQL — function renames, ClickHouse's parameterized-aggregate syntax,
``-If`` combinators, ``multiIf``, PREWHERE, and the FORMAT/SETTINGS
statement suffixes. Everything else (WITH TOTALS, LIMIT BY, SAMPLE,
ARRAY JOIN clauses, FINAL) has a dedicated operator in operators/ — the
translator REFUSES loudly rather than mistranslating, listing the
construct, so a runbook migration surfaces every non-1:1 query instead of
silently changing its meaning.

Translation is token-aware (quote- and paren-safe), not a SQL parser:
each rule rewrites one well-delimited construct, the subset is exactly
what the tests pin, and unknown functions pass through untouched (Spark
will error on genuinely unknown names — same contract as ClickHouse
running an unknown function). Catalyst sees plain Spark SQL, so the
translated query optimizes exactly like a hand-written one: pushdown,
pruning, join reordering, whole-stage codegen — translation happens once
on a string, never per row.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# token helpers (quote- and paren-aware)
# ---------------------------------------------------------------------------


def _find_call(s: str, name_re: str, start: int = 0):
    """Find the next ``name(...)`` call of a function matching ``name_re``
    outside quotes; return (name_start, open_paren_idx) or None."""
    pat = re.compile(r"(?i)\b(" + name_re + r")\s*\(")
    i = start
    while True:
        m = pat.search(s, i)
        if not m:
            return None
        # reject matches inside string literals: count unescaped quotes
        prefix = s[: m.start()]
        if prefix.count("'") % 2 == 1:
            i = m.end()
            continue
        return m.start(), s.index("(", m.end(1))


def _match_paren(s: str, open_idx: int) -> int:
    """Index of the ``)`` closing the ``(`` at open_idx (quote-aware)."""
    depth, i, n = 0, open_idx, len(s)
    quote = None
    while i < n:
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch == "'":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"unbalanced parentheses after index {open_idx}")


def _split_args(s: str) -> list[str]:
    """Split a call's argument text on top-level commas (quote/paren-aware)."""
    out, depth, buf, quote = [], 0, [], None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch == "'":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def _rewrite_calls(s: str, name_re: str, fn) -> str:
    """Rewrite every ``name(args)`` call: fn(name, [args]) -> replacement
    text. Processes left-to-right, recursing into already-rewritten text
    is avoided by restarting the scan after each replacement's end."""
    pos = 0
    while True:
        hit = _find_call(s, name_re, pos)
        if hit is None:
            return s
        name_start, open_idx = hit
        close_idx = _match_paren(s, open_idx)
        name = s[name_start:open_idx].strip()
        args = _split_args(s[open_idx + 1: close_idx])
        # translate arguments bottom-up first so nested dialect calls
        # inside the args are already Spark SQL when fn() assembles them
        args = [_translate_expr(a) for a in args]
        repl = fn(name, args)
        s = s[:name_start] + repl + s[close_idx + 1:]
        pos = name_start + len(repl)


# ---------------------------------------------------------------------------
# rules
# ---------------------------------------------------------------------------

# plain function renames: same arity, same argument order.
_RENAMES = {
    "todate": "to_date",
    "todatetime": "to_timestamp",
    "toyear": "year",
    "tomonth": "month",
    "todayofmonth": "day",
    "todayofweek": "dayofweek",
    "tohour": "hour",
    "tominute": "minute",
    "tosecond": "second",
    "groupargray": "collect_list",   # common misspelling guard (no-op)
    "grouparray": "collect_list",
    "groupuniqarray": "collect_set",
    "uniq": "approx_count_distinct",
    "any": "any_value",
    "anylast": "any_value",
    "argmax": "max_by",
    "argmin": "min_by",
    "has": "array_contains",
    "indexof": "array_position",
    "arrayelement": "element_at",
    "arraysort": "array_sort",
    "arrayreverse": "reverse",
    "arrayconcat": "concat",
    "arrayuniq": "array_distinct",
    "arrayflatten": "flatten",
    "lengthutf8": "length",
    "lowerutf8": "lower",
    "upperutf8": "upper",
    "lcase": "lower",
    "ucase": "upper",
    "position": "instr",
    "ifnull": "nvl",
    "startswith": "startswith",
    "endswith": "endswith",
    "trimboth": "trim",
    "trimleft": "ltrim",
    "trimright": "rtrim",
    "replaceall": "replace",
    "replaceregexpall": "regexp_replace",
    "tounixtimestamp": "unix_timestamp",
    "fromunixtimestamp": "from_unixtime",
    "stddevpop": "stddev_pop",
    "stddevsamp": "stddev_samp",
    "varpop": "var_pop",
    "varsamp": "var_samp",
    "covarpop": "covar_pop",
    "covarsamp": "covar_samp",
    "corr": "corr",
    "assumenotnull": "",             # identity: drop the wrapper
}

# formatDateTime %-codes -> Java SimpleDateFormat (the subset that maps
# 1:1; anything else refuses rather than silently reformatting)
_FDT_CODES = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%M": "mm", "%S": "ss", "%F": "yyyy-MM-dd", "%T": "HH:mm:ss",
    "%j": "DDD", "%e": "d",
}

# toStartOfX -> date_trunc('x', arg)
_TRUNC = {
    "tostartofday": "day", "tostartofhour": "hour",
    "tostartofminute": "minute", "tostartofmonth": "month",
    "tostartofquarter": "quarter", "tostartofyear": "year",
    "tostartofweek": "week", "tomonday": "week",
}

# toTypeName casts
_CASTS = {
    "touint8": "int", "touint16": "int", "touint32": "bigint",
    "touint64": "bigint", "toint8": "int", "toint16": "int",
    "toint32": "int", "toint64": "bigint",
    "tofloat32": "float", "tofloat64": "double",
    "tostring": "string",
}

# higher-order array functions: CH is lambda-first, Spark is
# collection-first — swap the argument order.
_LAMBDA_ARRAY = {
    "arraymap": "transform",
    "arrayfilter": "filter",
    "arrayexists": "exists",
    "arrayall": "forall",
}

# -If combinators: agg(x) filtered by the LAST argument.
_IF_COMBINATORS = {
    "countif": None,                 # countIf(cond) -> count_if(cond)
    "sumif": "sum", "avgif": "avg", "minif": "min", "maxif": "max",
    "uniqif": "approx_count_distinct",
}


def _fn_dispatch(name: str, args: list[str]) -> str:
    low = name.lower()
    if low in _TRUNC:
        return f"date_trunc('{_TRUNC[low]}', {args[0]})"
    if low in _CASTS:
        return f"CAST({args[0]} AS {_CASTS[low]})"
    if low == "countif":
        return f"count_if({args[0]})"
    if low == "uniqexact":
        return f"count(DISTINCT {', '.join(args)})"
    if low == "median":
        return f"percentile({args[0]}, 0.5)"
    if low == "arraystringconcat":
        # CH separator is OPTIONAL (default ''); Spark's array_join
        # requires one — caught by the registry-wide parse sweep
        sep = args[1] if len(args) > 1 else "''"
        return f"array_join({args[0]}, {sep})"
    if low in _IF_COMBINATORS and low != "countif":
        agg = _IF_COMBINATORS[low]
        *vals, cond = args
        return f"{agg}(if({cond}, {', '.join(vals)}, NULL))"
    if low == "multiif":
        if len(args) < 3 or len(args) % 2 == 0:
            raise ValueError(
                f"multiIf needs an odd argument count >= 3, got {len(args)}")
        parts = ["CASE"]
        for c, v in zip(args[:-1:2], args[1::2]):
            parts.append(f"WHEN {c} THEN {v}")
        parts.append(f"ELSE {args[-1]} END")
        return " ".join(parts)
    if low == "if":
        return f"if({', '.join(args)})"
    if low == "intdiv":
        return f"({args[0]} DIV {args[1]})"
    if low == "modulo":
        return f"({args[0]} % {args[1]})"
    if low == "arrayjoin":
        return f"explode({args[0]})"
    if low == "empty":
        return f"({args[0]} = '')"
    if low == "notempty":
        return f"({args[0]} <> '')"
    if low == "splitbychar":
        sep = args[0]
        m = re.fullmatch(r"'(.)'", sep)
        if not m:
            raise ValueError(
                "splitByChar: only single-character literal separators "
                f"translate ({sep!r} given)")
        return f"split({args[1]}, '{re.escape(m.group(1))}')"
    if low == "match":
        return f"({args[0]} RLIKE {args[1]})"
    if low == "isnull":
        return f"({args[0]} IS NULL)"
    if low == "isnotnull":
        return f"({args[0]} IS NOT NULL)"
    if low == "datediff":
        m = re.fullmatch(r"'(\w+)'", args[0])
        if not m:
            raise ValueError(
                "dateDiff: only literal unit strings translate "
                f"({args[0]!r} given)")
        return f"timestampdiff({m.group(1).upper()}, {args[1]}, {args[2]})"
    if low in ("jsonextractstring", "jsonextractint",
               "jsonextractfloat", "jsonextractraw"):
        m = re.fullmatch(r"'([\w.]+)'", args[1]) if len(args) == 2 else None
        if not m:
            raise ValueError(
                f"{name}: only a single literal key path translates")
        base = f"get_json_object({args[0]}, '$.{m.group(1)}')"
        if low == "jsonextractint":
            return f"CAST({base} AS BIGINT)"
        if low == "jsonextractfloat":
            return f"CAST({base} AS DOUBLE)"
        return base
    if low == "formatdatetime":
        m = re.fullmatch(r"'([^']*)'", args[1]) if len(args) == 2 else None
        if not m:
            raise ValueError(
                "formatDateTime: only a literal format string translates")
        fmt = m.group(1)
        out, i = [], 0
        while i < len(fmt):
            if fmt[i] == "%":
                code = fmt[i:i + 2]
                if code not in _FDT_CODES:
                    raise ValueError(
                        f"formatDateTime: no 1:1 Java format for {code!r}")
                out.append(_FDT_CODES[code])
                i += 2
            else:
                if fmt[i].isalpha():
                    out.append(f"'{fmt[i]}'")  # quote literal letters
                else:
                    out.append(fmt[i])
                i += 1
        return f"date_format({args[0]}, '{''.join(out)}')"
    if low in _LAMBDA_ARRAY:
        if len(args) != 2:
            raise ValueError(f"{name} translates only in its 2-argument "
                             f"(lambda, array) form, got {len(args)} args")
        return f"{_LAMBDA_ARRAY[low]}({args[1]}, {args[0]})"
    if low == "arraycount":
        if len(args) != 2:
            raise ValueError("arrayCount translates only in its "
                             "(lambda, array) form")
        return f"size(filter({args[1]}, {args[0]}))"
    if low == "arrayfirst":
        if len(args) != 2:
            raise ValueError("arrayFirst translates only in its "
                             "(lambda, array) form")
        return f"try_element_at(filter({args[1]}, {args[0]}), 1)"
    if low == "arraysum":
        # arraySum(a) and arraySum(f, a); both fold as doubles (the CH
        # result type for Float sums) so empty arrays yield 0.0
        arr = args[0] if len(args) == 1 else \
            f"transform({args[1]}, {args[0]})"
        return (f"aggregate({arr}, CAST(0 AS DOUBLE), "
                f"(acc, x) -> acc + x)")
    if low in _RENAMES:
        tgt = _RENAMES[low]
        if tgt == "":
            return args[0]
        if tgt is not None:
            return f"{tgt}({', '.join(args)})"
    raise AssertionError(f"_fn_dispatch missed {name}")  # pragma: no cover


_DISPATCH_RE = "|".join(
    sorted(
        {n for n in _RENAMES if _RENAMES[n] is not None}
        | set(_TRUNC) | set(_CASTS) | set(_IF_COMBINATORS)
        | {"uniqexact", "median", "arraystringconcat"}
        | set(_LAMBDA_ARRAY)
        | {"multiif", "if", "intdiv", "modulo", "arrayjoin", "empty",
           "notempty", "splitbychar", "match",
           "arraycount", "arrayfirst", "arraysum",
           "isnull", "isnotnull", "datediff", "formatdatetime",
           "jsonextractstring", "jsonextractint", "jsonextractfloat",
           "jsonextractraw"},
        key=len, reverse=True,
    )
)

# constructs with NO 1:1 Spark SQL equivalent — refuse, never mistranslate.
# Each names the dedicated operator that covers the semantics.
_REFUSE = [
    (r"(?i)\bWITH\s+TOTALS\b", "WITH TOTALS (use q_with_totals / rollup)"),
    (r"(?i)\bLIMIT\s+\d+\s+BY\b", "LIMIT n BY (use q_limit_by)"),
    (r"(?i)\bSAMPLE\s+[\d.]", "SAMPLE clause (use q_sample_by)"),
    (r"(?i)\bARRAY\s+JOIN\b", "ARRAY JOIN clause (use arrayJoin(col) in the "
                              "SELECT list, or q_array_join)"),
    (r"(?i)\bFINAL\b", "FINAL (read through SparkMergeTree.query*, which "
                       "always collapses)"),
    (r"(?i)\bASOF\s+JOIN\b", "ASOF JOIN (use q_join_asof's window form)"),
]


def translate_select(sql: str) -> str:
    """ClickHouse-dialect SELECT -> Spark SQL string (see module doc)."""
    s = sql.strip().rstrip(";").strip()
    for pat, what in _REFUSE:
        if re.search(pat, s):
            raise ValueError(f"no 1:1 Spark translation for {what}")
    # statement suffixes: FORMAT <name> / SETTINGS k=v[, ...] at the end
    s = re.sub(r"(?is)\s+FORMAT\s+\w+\s*$", "", s)
    s = re.sub(r"(?is)\s+SETTINGS\s+[\w]+\s*=\s*[^,]+(?:\s*,\s*[\w]+\s*=\s*[^,]+)*\s*$", "", s)
    # PREWHERE is an optimizer hint in CH; Spark's pushdown makes WHERE
    # equivalent. PREWHERE+WHERE both present -> AND them.
    if re.search(r"(?i)\bPREWHERE\b", s):
        if re.search(r"(?i)\bWHERE\b", s):
            # PREWHERE a WHERE b  ->  WHERE (a) AND (b)
            m = re.search(
                r"(?is)\bPREWHERE\b(.*?)\bWHERE\b(.*?)"
                r"(\bGROUP\s+BY\b|\bORDER\s+BY\b|\bLIMIT\b|$)", s)
            if not m:
                raise ValueError("unsupported PREWHERE placement")
            s = (s[: m.start()] + f"WHERE ({m.group(1).strip()}) AND "
                 f"({m.group(2).strip()}) " + m.group(3) + s[m.end():])
        else:
            s = re.sub(r"(?i)\bPREWHERE\b", "WHERE", s)
    s = re.sub(r"(?i)\bGLOBAL\s+(IN|JOIN)\b", r"\1", s)
    return _translate_expr(s)


def _translate_expr(s: str) -> str:
    # parameterized aggregates first: quantile[Exact](p)(x),
    # quantiles(p1,...)(x), topK(n)(x) — the (params)(args) call shape.
    s = _rewrite_parameterized(s)
    s = _rewrite_calls(s, _DISPATCH_RE, _fn_dispatch)
    # zero-arg renames (no parens to match)
    s = re.sub(r"(?i)\bcount\(\s*\)", "count(*)", s)
    s = re.sub(r"(?i)\bnow\(\)", "current_timestamp()", s)
    s = re.sub(r"(?i)\btoday\(\)", "current_date()", s)
    s = re.sub(r"(?i)\byesterday\(\)", "date_sub(current_date(), 1)", s)
    return s


def _rewrite_parameterized(s: str) -> str:
    pat = r"quantileexact|quantiles|quantile|topkweighted|topk"
    pos = 0
    while True:
        hit = _find_call(s, pat, pos)
        if hit is None:
            return s
        name_start, open_idx = hit
        close_idx = _match_paren(s, open_idx)
        after = close_idx + 1
        while after < len(s) and s[after].isspace():
            after += 1
        if after >= len(s) or s[after] != "(":
            pos = close_idx  # bare call, not (params)(args) — skip
            continue
        args_close = _match_paren(s, after)
        name = s[name_start:open_idx].strip().lower()
        params = [_translate_expr(a)
                  for a in _split_args(s[open_idx + 1: close_idx])]
        args = [_translate_expr(a)
                for a in _split_args(s[after + 1: args_close])]
        if name in ("quantile", "quantileexact"):
            repl = f"percentile({args[0]}, {params[0]})"
        elif name == "quantiles":
            repl = f"percentile({args[0]}, array({', '.join(params)}))"
        elif name == "topk":
            raise ValueError(
                "topK(n)(x) has no exact single-expression Spark form — "
                "use q_topk's groupBy + rank pattern")
        elif name == "topkweighted":
            raise ValueError(
                "topKWeighted has no single-expression Spark form — "
                "use q_topk_weighted")
        else:  # pragma: no cover
            raise AssertionError(name)
        s = s[:name_start] + repl + s[args_close + 1:]
        pos = name_start + len(repl)


def ch_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run a ClickHouse-dialect SELECT against the session's registered
    views: one-string translation, then ``spark.sql`` — Catalyst sees
    plain Spark SQL and optimizes it like any hand-written query."""
    return spark.sql(translate_select(sql))


class ClickHouseSession:
    """Unified "paste any ClickHouse statement" front end: routes each
    statement to the engine or translator that owns its semantics —
    CREATE TABLE → ``create_table_from_ddl`` (a SparkMergeTree under
    this session's base directory), ALTER/OPTIMIZE/TRUNCATE/INSERT/
    DESCRIBE/etc. on a known table → ``execute_ddl``, SELECT → the
    dialect translator over the session's registered views PLUS a view
    per created engine table (refreshed after mutating statements, so a
    SELECT observes its own session's writes). DROP TABLE closes and
    removes the engine table.

    This is the migration surface in one object: a runbook or dashboard
    script executes top to bottom unchanged. Each statement stays on its
    owner's scale path — engine DDL is manifest-metadata work, SELECTs
    are Catalyst plans; the router itself never touches data.
    """

    def __init__(self, spark: SparkSession, base_dir: str):
        import os

        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self.tables: dict[str, object] = {}

    def _refresh_view(self, name: str) -> None:
        self.tables[name].query_all().createOrReplaceTempView(name)

    def execute(self, sql: str):
        import os
        import re as _re

        from clickhouse_mergetree_spark.engine.ddl import (
            create_table_from_ddl, execute_ddl)

        s = sql.strip().rstrip(";").strip()
        m = _re.match(r"(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
                      r"(?:[\w`]+\.)?([\w`]+)", s)
        if m:
            name = m.group(1).strip("`")
            self.tables[name] = create_table_from_ddl(
                self.spark, os.path.join(self.base_dir, name), s)
            self._refresh_view(name)
            return self.tables[name]
        m = _re.match(r"(?is)^DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?"
                      r"(?:[\w`]+\.)?([\w`]+)$", s)
        if m:
            name = m.group(1).strip("`")
            t = self.tables.pop(name, None)
            if t is None:
                if _re.search(r"(?i)IF\s+EXISTS", s):
                    return None
                raise ValueError(f"unknown table {name!r}")
            t.close()
            self.spark.catalog.dropTempView(name)
            return None
        m = _re.match(r"(?is)^(ALTER\s+TABLE|OPTIMIZE\s+TABLE|TRUNCATE"
                      r"\s+TABLE|INSERT\s+INTO|DESC(?:RIBE)?(?:\s+TABLE)?|"
                      r"SHOW\s+CREATE\s+TABLE|SYSTEM\s+\w+\s+MERGES)\s+"
                      r"(?:[\w`]+\.)?([\w`]+)", s)
        if m:
            name = m.group(2).strip("`")
            if name not in self.tables:
                raise ValueError(f"unknown table {name!r} (created tables: "
                                 f"{sorted(self.tables)})")
            out = execute_ddl(self.tables[name], s)
            self._refresh_view(name)
            return out
        if _re.match(r"(?is)^(SELECT|WITH)\b", s):
            return ch_sql(self.spark, s)
        raise ValueError(f"unroutable statement: {s[:80]!r}")

"""Deterministic scale-factor data generator (VERDICT r10 item 3).

Generates the same ten-table synthetic schema as the driver's read-only
fixtures at /root/testdata/sf* (schemas per FIXTURES.md §2, value
domains matched to the sf0.1 parquet: same label sets, key-range ratios,
date windows, and word vocabulary) at an arbitrary scale factor — used
for the sf1 (10×) scaling rehearsal that turns the "fine at 100 TB"
plan-shape claims into measured ratios (BENCH_SCALING.json).

All randomness is hash(i)-derived (DuckDB xxhash), so the output is
bit-reproducible regardless of thread count — no RNG state anywhere.
Row counts scale linearly from the sf0.1 base (region/nation are fixed
dimension tables and are copied verbatim from the reference SF dir).

Usage: python tools/gen_scale_data.py SF OUT_DIR [--ref /root/testdata/sf0.1]
e.g.:  python tools/gen_scale_data.py 1 /root/repo/scale_data/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

# sf0.1 row counts (the scaling base)
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

VOCAB = ("a agg batch big column customer data dup fast filter group hash "
         "join key line merge order part query row scan slow small sort "
         "spark stream table the value vector window").split()
SEGMENTS = ["MACHINERY", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD", "BUILDING"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "ECONOMY", "SMALL", "PROMO"]
ADJ = ["cold", "new", "blue", "old", "red", "large", "hot", "small"]
NOUN = ["bolt", "plate", "rod", "anvil", "ring", "gear", "gizmo", "widget"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "en", "en", "en", "es", "fr", "de", "zh"]  # ~40% en, like sf0.1
SOURCES = [f"src{i}" for i in range(20)]


def doc_vocab(n_docs: int) -> list[str]:
    """Document word vocabulary for a corpus of n_docs, growing with
    corpus size per Heaps' law (V ∝ n^0.5) above the sf0.1 base.

    Why growth is the REALISTIC scale model and a fixed vocabulary is a
    broken benchmark input: with 31 words forever, the 3-shingle space
    saturates at 31³ = 29,791 types, per-shingle document frequency grows
    linearly with corpus size, and the GROUND-TRUTH number of near-dup
    pairs (Jaccard ≥ t) itself grows ~quadratically — no algorithm can
    emit a quadratic answer in linear time, so timing n-gram dedup on
    that input measures the input, not the operator (r12: at sf5 the
    candidate join OOM'd an 8 GiB heap and ran >15 min at 48 GiB; the
    same query on Heaps-grown vocabulary is in-class). Real corpora grow
    vocabulary with size (Heaps 1978, β≈0.4–0.6 for web text), keeping
    per-shingle df bounded and near-dup density ~constant.

    At or below the sf0.1 base the vocabulary IS the fixture's 31 words
    (bit-compat with the driver's testdata domains); above it, extra
    words are deterministic suffixed variants of the base words, so
    token shape (lowercase, whitespace-delimited) is unchanged."""
    base = BASE["documents"]
    if n_docs <= base:
        return list(VOCAB)
    v = int(round(len(VOCAB) * (n_docs / base) ** 0.5))
    return list(VOCAB) + [
        f"{VOCAB[k % len(VOCAB)]}{k // len(VOCAB) + 2}"
        for k in range(v - len(VOCAB))
    ]


def emb_clusters(n_emb: int) -> int:
    """Embedding cluster count: the fixture's literal 10 at or below the
    sf0.1 base (byte-identical output), growing linearly above it so
    cluster SIZE stays at the base's ~200 rows. A fixed cluster count
    makes the ground-truth near-dup pair count quadratic in corpus size
    (every cluster holds n/10 mutually-similar rows) — a broken
    benchmark input for embedding dedup, same reasoning as doc_vocab."""
    return max(10, n_emb * 10 // BASE["embeddings"])


def _u(expr: str, salt: int) -> str:
    """Uniform [0,1) from a row expression — pure hash, no RNG state."""
    return f"((hash(({expr}) * 2654435761 + {salt}) % 1000000) / 1000000.0)"


def _pick(lst: list[str], expr: str, salt: int) -> str:
    items = ", ".join(f"'{x}'" for x in lst)
    return f"[{items}][1 + (hash(({expr}) + {salt}) % {len(lst)})::INT]"


def generate(sf: float, out_dir: str, ref_dir: str) -> None:
    mult = sf / 0.1
    n = {t: int(round(c * mult)) for t, c in BASE.items()}
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def copy(sql: str, table: str) -> None:
        path = os.path.join(out_dir, f"{table}.parquet")
        con.execute(f"COPY ({sql}) TO '{path}' (FORMAT parquet)")
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        print(f"{table}: {rows} rows", file=sys.stderr)

    # fixed dimensions: copy verbatim (their content is SF-invariant)
    for t in ("region", "nation"):
        copy(f"SELECT * FROM read_parquet('{ref_dir}/{t}.parquet')", t)

    copy(f"""
        SELECT i::BIGINT AS c_custkey,
               printf('Customer#%09d', i::INT) AS c_name,
               (hash(i + 11) % 25)::INT AS c_nationkey,
               round(-999.99 + {_u('i', 12)} * 10999.98, 2) AS c_acctbal,
               {_pick(SEGMENTS, 'i', 13)} AS c_mktsegment
        FROM range({n['customer']}) t(i)""", "customer")

    copy(f"""
        SELECT i::BIGINT AS s_suppkey,
               printf('Supplier#%09d', i::INT) AS s_name,
               (hash(i + 21) % 25)::INT AS s_nationkey,
               round(-999.99 + {_u('i', 22)} * 10999.98, 2) AS s_acctbal
        FROM range({n['supplier']}) t(i)""", "supplier")

    copy(f"""
        SELECT i::BIGINT AS p_partkey,
               {_pick(ADJ, 'i', 31)} || ' ' || {_pick(NOUN, 'i', 32)}
                   AS p_name,
               'Brand#' || (1 + hash(i + 33) % 25)::INT AS p_brand,
               {_pick(PTYPES, 'i', 34)} AS p_type,
               (1 + hash(i + 35) % 50)::INT AS p_size,
               round(900.0 + {_u('i', 36)} * 99.9, 2) AS p_retailprice
        FROM range({n['part']}) t(i)""", "part")

    # orders: o_orderdate spans 1995-01-01 .. 2001-08-01 like the fixture
    copy(f"""
        SELECT i::BIGINT AS o_orderkey,
               (hash(i + 41) % {n['customer']})::BIGINT AS o_custkey,
               {_pick(['O', 'P', 'F'], 'i', 42)} AS o_orderstatus,
               round(1000.0 + {_u('i', 43)} * 499000.0, 2) AS o_totalprice,
               TIMESTAMP '1995-01-01'
                   + to_days((hash(i + 44) % 2405)::INT) AS o_orderdate,
               {_pick(PRIORITIES, 'i', 45)} AS o_orderpriority
        FROM range({n['orders']}) t(i)""", "orders")

    # lineitem: 1..7 lines per order (avg 4), shipdate = orderdate + 1..120d
    copy(f"""
        SELECT o.i::BIGINT AS l_orderkey,
               (hash(o.i * 7 + l.j + 51) % {n['part']})::BIGINT AS l_partkey,
               (hash(o.i * 7 + l.j + 52) % {n['supplier']})::BIGINT
                   AS l_suppkey,
               (l.j + 1)::INT AS l_linenumber,
               (1 + hash(o.i * 7 + l.j + 53) % 50)::DOUBLE AS l_quantity,
               round(900.0 + {_u('o.i * 7 + l.j', 54)} * 104099.0, 2)
                   AS l_extendedprice,
               round({_u('o.i * 7 + l.j', 55)} * 0.1, 2) AS l_discount,
               round({_u('o.i * 7 + l.j', 56)} * 0.08, 2) AS l_tax,
               {_pick(['R', 'A', 'N'], 'o.i * 7 + l.j', 57)} AS l_returnflag,
               {_pick(['O', 'F'], 'o.i * 7 + l.j', 58)} AS l_linestatus,
               TIMESTAMP '1995-01-01'
                   + to_days((hash(o.i + 44) % 2405)::INT)
                   + to_days((1 + hash(o.i * 7 + l.j + 59) % 120)::INT)
                   AS l_shipdate
        FROM range({n['orders']}) o(i), range(7) l(j)
        WHERE l.j < 1 + hash(o.i + 50) % 7""", "lineitem")

    # events: 30-day window, ~value Exp(mean 50), user pool scales with SF
    n_users = int(round(1500 * mult))
    copy(f"""
        SELECT i::BIGINT AS event_id,
               TIMESTAMP '2024-01-01' + INTERVAL (
                   ({_u('i', 61)} * 2591999000000)::BIGINT) MICROSECOND
                   AS ts,
               (hash(i + 62) % {n_users})::BIGINT AS user_id,
               {_pick(ETYPES, 'i', 63)} AS event_type,
               round(-50.0 * ln(1.0 - {_u('i', 64)} * 0.999999), 2) AS value,
               '{{"k": ' || (hash(i + 65) % 100)::INT || '}}' AS props
        FROM range({n['events']}) t(i)""", "events")

    # documents: 10..100 words from the corpus-sized vocabulary (fixture
    # words at/below the sf0.1 base; Heaps-grown above — see doc_vocab).
    # Formulated as token-unnest + vocab-table join + ordered string_agg
    # rather than a per-token list-literal index: the [vocab][idx] form
    # re-evaluates a |V|-element VARCHAR list literal per TOKEN,
    # single-threaded — measured >15 min for sf10's 500k docs, vs ~2 s
    # for the join at sf1. Output is BIT-IDENTICAL (same hash choices,
    # j-ordered aggregation; the r13 switch was verified with a
    # two-sided EXCEPT against the pre-switch sf1 parquet: 0 rows).
    words = doc_vocab(n["documents"])
    con.execute("CREATE OR REPLACE TABLE __vocab(idx INT, word VARCHAR)")
    con.executemany("INSERT INTO __vocab VALUES (?, ?)",
                    list(enumerate(words)))
    copy(f"""
        WITH toks AS (
            SELECT o.i, r.j,
                   (hash(o.i * 131 + r.j * 7 + 72)
                    % {len(words)})::INT AS widx
            FROM range({n['documents']}) o(i), range(100) r(j)
            WHERE r.j < 10 + hash(o.i + 71) % 91
        ), d AS (
            SELECT i, string_agg(v.word, ' ' ORDER BY j) AS text
            FROM toks JOIN __vocab v ON v.idx = toks.widx
            GROUP BY i
        )
        SELECT i::BIGINT AS doc_id, text,
               {_pick(LANGS, 'i', 73)} AS lang,
               {_pick(SOURCES, 'i', 74)} AS source,
               length(text)::BIGINT AS n_chars
        FROM d""", "documents")

    # embeddings: dim 64, cluster centroids + noise (matches the
    # fixture's per-component range of roughly ±0.4). Cluster count
    # grows with the corpus above the sf0.1 base (same reasoning as
    # doc_vocab): with 10 clusters forever, every cluster holds n/10
    # rows and the GROUND-TRUTH near-dup pair count (within-cluster
    # cosine ≈ 0.85) grows quadratically — timing embedding near-dedup
    # on that input measures the input, not the operator (r12: 25.4M
    # candidate pairs at sf5 even under a perfectly uniform 14-bit
    # bucketing). Real corpora grow topics with size; holding cluster
    # SIZE at the sf0.1 base (~200 rows) keeps near-dup density linear.
    # At or below the base this is the fixture's literal 10 clusters —
    # byte-identical output.
    n_clusters = emb_clusters(n["embeddings"])
    copy(f"""
        SELECT i::BIGINT AS vec_id,
               list_transform(range(64), j -> (
                   ((hash((hash(i + 81) % {n_clusters}) * 64 + j + 82)
                        % 2000)::INT - 1000) / 1000.0 * 0.3
                   + ((hash(i * 64 + j + 83) % 2000)::INT - 1000)
                        / 1000.0 * 0.12)::FLOAT) AS embedding,
               (hash(i + 81) % {n_clusters})::INT AS label
        FROM range({n['embeddings']}) t(i)""", "embeddings")
    con.close()


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    ref = "/root/testdata/sf0.1"
    if "--ref" in sys.argv:
        ref = sys.argv[sys.argv.index("--ref") + 1]
    generate(sf, out_dir, ref)


if __name__ == "__main__":
    main()

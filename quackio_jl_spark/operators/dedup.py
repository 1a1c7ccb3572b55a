"""Deduplication operators for LLM training-data pipelines (driver mandate,
BASELINE.json north_star; beyond the reference's I/O-only surface):
exact, MinHash+LSH, SimHash, n-gram Jaccard. All built-in Spark SQL — the
hash functions are md5-based so the DuckDB oracle reproduces them bit-for-bit
(Spark's murmur3 ``hash()`` has no DuckDB twin).

Scale design (the point of each operator):
- exact dedup: one shuffle on the (hashed) text key. At 100 TB group on
  ``md5(text)`` (16-byte key) rather than the text itself to keep shuffle
  volume at key-size, not document-size.
- MinHash+LSH: linear pipeline — shingle explode is map-side; the only
  shuffles are the per-doc signature group-by (key=doc_id) and the band
  self-join (key=band bucket). NEVER an all-pairs cross join; candidate
  pairs are generated per LSH bucket, which is how this survives 10^9 docs.
- SimHash: map-side bit explode + one shuffle on doc_id. Hamming-ball
  candidate generation would bucket on signature bytes (future round).
- n-gram Jaccard: exact pairwise verification — deliberately restricted to
  a candidate subset; at scale this runs AFTER LSH pruning, never globally.
"""

from __future__ import annotations

from pyspark.sql import Window as W_
from pyspark.sql import functions as F

from quackio_jl_spark.functions.seq import seq_asc

from ..functions.fanout import fanout
from ..plans.registry import query, table

N_MINHASH = 8          # 8 hash functions
LSH_BAND_SIZE = 2      # → 4 bands of 2 — catches moderately-similar pairs
SHINGLE_K = 3          # 3-token shingles

# Skew guard: an LSH bucket with more than this many members generates
# O(n^2) candidate pairs from one shuffle key — one degenerate shingle set
# (boilerplate headers, empty docs) can melt a 100 TB run. Buckets past the
# cap are dropped as "too common to be informative": their members are
# near-certainly exact/boilerplate dupes that exact dedup already catches,
# and genuinely similar pairs still meet in their other (informative)
# bands. Applied identically in the Spark pipeline and the DuckDB oracle,
# so the gate verifies the CAPPED semantics. Measured bucket max at sf0.1
# is 12, so the cap never triggers at test scale; it exists for the
# adversarial tail at 10^9 docs.
LSH_MAX_BUCKET = 1000


# ----------------------------------------------------------------- exact dedup

@query(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: keep the lowest doc_id per distinct text. Grouping on
    md5(text) (not text) keeps the shuffle key 16 bytes at any scale."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "n_copies")


@query(
    "dedup_exact_normalized",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')))
    """,
)
def dedup_exact_normalized(spark, sf_dir):
    """Exact dedup after case/punct/whitespace normalization."""
    d = table(spark, sf_dir, "documents")
    norm = F.md5(F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]+", " ")))
    return d.groupBy(norm).agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "n_copies")


# ------------------------------------------------------------------ shingling

def shingles_all(docs):
    """(doc_id, shingle) rows WITH duplicates: map-side only — explode of a
    per-row generated array, zero shuffle. The MinHash path uses this
    directly because MIN is duplicate-insensitive: partial aggregation
    (map-side combine) collapses each partition to one row per doc before
    any shuffle, so deduplicating shingles first would only ADD a full
    shuffle of shingle text for no semantic gain.

    Round-11: the input fans out of single-row-group scans (one tiny
    doc_id-keyed exchange of the raw text, identity at cluster scale) so
    the shingle explode + hashing + map-side combine — the dominant cost
    of every MinHash-family consumer — parallelizes instead of running
    as one task."""
    toks = fanout(docs, "doc_id").select(
        "doc_id", F.split("text", " ").alias("t")
    ).filter(
        F.size("t") >= SHINGLE_K
    )
    gen = F.transform(
        F.sequence(F.lit(0), F.size("t") - SHINGLE_K),
        lambda i: F.concat_ws(" ", F.slice("t", i + 1, SHINGLE_K)),
    )
    return toks.select("doc_id", F.explode(gen).alias("shingle"))


def shingles(docs):
    """(doc_id, shingle) rows: distinct 3-token shingles per document.
    Needed where shingles are treated as a SET (Jaccard sizes/intersections);
    the distinct is one shuffle on (doc_id, shingle)."""
    return shingles_all(docs).distinct()


_SHINGLES_SQL = f"""
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {SHINGLE_K}
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i+1:i+{SHINGLE_K}], ' ') AS shingle
      FROM toks, UNNEST(range(len(t) - {SHINGLE_K - 1})) AS u(i)
    )
"""


# -------------------------------------------------------------- MinHash + LSH

def minhash_signatures(docs=None, sh=None):
    """Per-doc MinHash signature: the 8 hash functions are four 8-hex-char
    slices of each of TWO md5 digests (h_{4g+j} = min over shingles of
    substr(md5('<g>:' || shingle), 8j+1, 8)) — 2 md5 evaluations per shingle
    instead of 8, identical semantics in any engine with md5. The explicit
    pre-aggregation projection guarantees each digest is computed once."""
    if sh is None:
        sh = shingles_all(docs)
    n_groups = (N_MINHASH + 3) // 4
    proj = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{g}:"), F.col("shingle"))).alias(f"m{g}")
            for g in range(n_groups)
        ],
    )
    aggs = []
    for i in range(N_MINHASH):
        g, j = divmod(i, 4)
        aggs.append(F.min(F.substring(F.col(f"m{g}"), 8 * j + 1, 8)).alias(f"h{i}"))
    return proj.groupBy("doc_id").agg(*aggs)


def corpus_minhash_signatures(spark, sf_dir):
    """The whole-corpus MinHash signature table as a session fragment
    (round-9 ADVICE: serve version-diff's sig_a through fragcache so
    repeated snapshot diffs / ingest assignments / the signature query
    reuse ONE build). This is the stored LSH index of a production
    pipeline — corpus-cardinality but compact (~70 bytes/doc), and
    persist()'s MEMORY_AND_DISK default spills rather than OOMs at
    scale. Audit mode bypasses the cache like every fragment."""
    from ..fragcache import fragment

    def build():
        return minhash_signatures(
            docs=table(spark, sf_dir, "documents").select("doc_id", "text")
        )

    return fragment(spark, sf_dir, "minhash_sig_corpus", build)


def _minhash_sig_sql() -> str:
    mins = ",\n        ".join(
        f"MIN(substr(md5('{i // 4}:' || shingle), {8 * (i % 4) + 1}, 8)) AS h{i}"
        for i in range(N_MINHASH)
    )
    return f"""
    sig AS (
      SELECT doc_id,
        {mins}
      FROM sh GROUP BY doc_id
    )"""


def _bands_sql() -> str:
    n_bands = N_MINHASH // LSH_BAND_SIZE
    selects = []
    for b in range(n_bands):
        key = " || ".join(f"h{b * LSH_BAND_SIZE + j}" for j in range(LSH_BAND_SIZE))
        selects.append(f"SELECT doc_id, {b} AS band, {key} AS key FROM sig")
    return "\n      UNION ALL\n      ".join(selects)


def _lsh_chain_sql(src: str = "documents", sfx: str = "") -> str:
    """The full shingle -> signature -> band -> capped-bucket -> candidate
    CTE chain over an arbitrary source relation ``src(doc_id, text)``,
    with every CTE name suffixed by ``sfx`` so two chains (e.g. corpus
    version A and version B in dedup_cluster_version_diff) can coexist in
    one WITH. The sfx='' instance is semantically identical to
    _SHINGLES_SQL + _minhash_sig_sql() + _cand_sql()."""
    mins = ",\n        ".join(
        f"MIN(substr(md5('{i // 4}:' || shingle), {8 * (i % 4) + 1}, 8)) AS h{i}"
        for i in range(N_MINHASH)
    )
    n_bands = N_MINHASH // LSH_BAND_SIZE
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || ".join(
            f"h{b * LSH_BAND_SIZE + j}" for j in range(LSH_BAND_SIZE)
        )
        + f" AS key FROM sig{sfx}"
        for b in range(n_bands)
    )
    return f"""
    toks{sfx} AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM {src}
      WHERE len(string_split(text, ' ')) >= {SHINGLE_K}
    ),
    sh{sfx} AS (
      SELECT DISTINCT doc_id, array_to_string(t[i+1:i+{SHINGLE_K}], ' ') AS shingle
      FROM toks{sfx}, UNNEST(range(len(t) - {SHINGLE_K - 1})) AS u(i)
    ),
    sig{sfx} AS (
      SELECT doc_id,
        {mins}
      FROM sh{sfx} GROUP BY doc_id
    ),
    bands{sfx} AS (
      {band_selects}
    ),
    bok{sfx} AS (
      SELECT band, key FROM bands{sfx} GROUP BY band, key
      HAVING COUNT(*) BETWEEN 2 AND {LSH_MAX_BUCKET}
    ),
    cand{sfx} AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM bands{sfx} a
      JOIN bok{sfx} ON bok{sfx}.band = a.band AND bok{sfx}.key = a.key
      JOIN bands{sfx} b ON a.band = b.band AND a.key = b.key
                  AND a.doc_id < b.doc_id
    )"""


def _cand_sql() -> str:
    """The shared ``cand`` CTE chain (bands -> capped buckets -> candidate
    pairs) used by every oracle that consumes LSH candidates; mirrors the
    Spark pipeline's LSH_MAX_BUCKET skew cap exactly."""
    return f"""
    bands AS (
      {_bands_sql()}
    ),
    bok AS (
      SELECT band, key FROM bands GROUP BY band, key
      HAVING COUNT(*) BETWEEN 2 AND {LSH_MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM bands a
      JOIN bok ON bok.band = a.band AND bok.key = a.key
      JOIN bands b ON a.band = b.band AND a.key = b.key
                  AND a.doc_id < b.doc_id
    )"""


@query(
    "dedup_minhash_signatures",
    oracle="WITH" + _SHINGLES_SQL + "," + _minhash_sig_sql() + "\n    SELECT * FROM sig",
)
def dedup_minhash_signatures(spark, sf_dir):
    """The MinHash signature table itself (hash-checked against the oracle).
    Single-pass: map-side shingle explode + md5, partial-aggregated MIN, one
    shuffle keyed on doc_id carrying ~8 hashes per doc per partition.
    Served through the session signature fragment shared with the LSH
    candidate build, the ingest index, and the version diff."""
    return corpus_minhash_signatures(spark, sf_dir)


@query(
    "dedup_minhash_lsh_pairs",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + "\n    SELECT doc1, doc2 FROM cand",
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    """LSH candidate pairs: docs agreeing on any band of the signature.

    Shape chosen for scale: instead of a band-table SELF-JOIN (which would
    run the whole signature pipeline twice and shuffle both copies), group
    band rows by (band, band-hash) ONCE — with map-side combine — and
    generate the pairs inside each bucket from the sorted doc_id array.
    One signature computation, one bucket shuffle, one small distinct over
    candidate pairs; never an all-pairs comparison. Buckets larger than
    LSH_MAX_BUCKET are dropped (skew guard — see its comment; the oracle
    applies the identical cap).

    The candidate-pair table is a small derived fragment consumed by the
    whole verify/estimator/cluster family — served through the session
    fragment cache (quackio_jl_spark.fragcache), built once per
    (session, dataset)."""
    from ..fragcache import fragment

    def build():
        return lsh_pairs_from_signatures(
            corpus_minhash_signatures(spark, sf_dir)
        )

    return fragment(spark, sf_dir, "minhash_lsh_cand", build)


def bands_from_signatures(sig):
    """(doc_id, band, key) rows from a signature frame — the LSH band
    explode shared by the bucketer, the incremental ingest probes, and
    the streaming twins."""
    n_bands = N_MINHASH // LSH_BAND_SIZE
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            *[
                                F.col(f"h{b * LSH_BAND_SIZE + j}")
                                for j in range(LSH_BAND_SIZE)
                            ]
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")


def lsh_pairs_from_signatures(sig):
    """(doc1, doc2) LSH candidate pairs from a signature frame — the
    band/bucket/pair tail of dedup_minhash_lsh_pairs, factored out so an
    incrementally-maintained signature table (dedup_cluster_version_diff)
    reuses the identical bucketed shape and skew cap."""
    n_bands = N_MINHASH // LSH_BAND_SIZE
    band_rows = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(
                    *[
                        F.col(f"h{b * LSH_BAND_SIZE + j}")
                        for j in range(LSH_BAND_SIZE)
                    ]
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_rows).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= LSH_MAX_BUCKET))
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids) - i - 1), "
                "y -> struct(x AS doc1, y AS doc2))))"
            )
        ).alias("p")
    )
    return pairs.select("p.doc1", "p.doc2").distinct()


# ------------------------------------------------------------------- SimHash

SIMHASH_BITS = 64  # two 32-bit words: md5(token) hex chars 1-8 and 9-16
_WORD_BITS = 32
_PACK_FIELD = 21  # bits per packed vote counter (bound: 2^21 distinct tokens/doc)
_PACK_PER = 3  # counters per bigint aggregate (3 x 21 = 63 bits used)

# Skew guard for the Hamming-block candidate join, same contract as
# LSH_MAX_BUCKET: a block bucket past the cap is dropped before the
# in-bucket self-join (quadratic fan-out). This synthetic corpus is
# simhash-degenerate (tiny vocabulary — measured hottest 16-bit block
# bucket at sf0.1: 1639 of 5000 docs), so the cap is sized above that to
# keep test-scale results complete while still bounding an adversarial
# bucket at 10^9 docs to <= cap^2/2 pairs. Applied identically in the
# oracle SQL.
SIMHASH_MAX_BUCKET = 4096


@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tv AS (
      SELECT doc_id,
        ('0x' || substr(md5(token), 1, 8))::BIGINT AS vhi,
        ('0x' || substr(md5(token), 9, 8))::BIGINT AS vlo
      FROM tok
    ),
    bits AS (
      SELECT doc_id, j,
        SUM(CASE WHEN (vhi >> j) & 1 = 1 THEN 1 ELSE -1 END) AS shi,
        SUM(CASE WHEN (vlo >> j) & 1 = 1 THEN 1 ELSE -1 END) AS slo
      FROM tv, UNNEST(range({_WORD_BITS})) AS u(j)
      GROUP BY doc_id, j
    )
    SELECT doc_id,
      CAST(SUM(CASE WHEN shi > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash_hi,
      CAST(SUM(CASE WHEN slo > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash_lo
    FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash over distinct tokens: per-bit majority vote of token hashes,
    reassembled into a 64-bit signature carried as TWO 32-bit words
    (simhash_hi, simhash_lo — hex chars 1-8 and 9-16 of md5(token)). Two
    words instead of one 64-bit int keeps every intermediate inside signed
    BIGINT range in both engines (no unsigned-overflow edge at bit 63);
    32-bit signatures collide far too often at 10^9 docs.

    Shape: the per-bit votes are PACKED CONDITIONAL AGGREGATES over the
    token rows — not a tokens×64 bit-explode (which would 64× the row
    count and add a (doc_id, bit) shuffle), and not 64 separate sum
    columns either: three 21-bit counter fields ride in each bigint sum
    (safe for up to 2^21 distinct tokens per doc), so the groupBy carries
    22 aggregate buffers instead of 64. That matters twice at scale —
    smaller partial-aggregate rows through the shuffle, and a ~3× smaller
    generated-code footprint (the 64-sum variant cost ~8 s of first-run
    Janino compile before any data moved). One distinct on
    (doc_id, token), one partial-aggregated shuffle on doc_id; the
    signature assembles from the packed fields with a runtime
    aggregate(sequence(0,31)) loop instead of 64 unrolled WHEN terms.
    The tokenizer fans out of the one-task single-row-group scan so the
    md5 + packed-vote map work parallelizes."""
    d = fanout(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token")).distinct()
    h = F.md5("token")
    tv = tok.select(
        "doc_id",
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint").alias("vhi"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint").alias("vlo"),
    )
    n_groups = (_WORD_BITS + _PACK_PER - 1) // _PACK_PER

    def pack_exprs(v, prefix):
        # sum of (v>>j)&1 per bit, 3 bit-counters packed per bigint at
        # 21-bit offsets; the +1/-1 majority becomes 2*ones > count
        out = []
        for g, lo in enumerate(range(0, _WORD_BITS, _PACK_PER)):
            bits = range(lo, min(lo + _PACK_PER, _WORD_BITS))
            e = " + ".join(
                f"((({v} >> {j}) & 1) << {_PACK_FIELD * (j - lo)})" for j in bits
            )
            out.append(F.sum(F.expr(e)).alias(f"{prefix}{g}"))
        return out

    votes = tv.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        *pack_exprs("vhi", "a"),
        *pack_exprs("vlo", "b"),
    )
    packed = votes.select(
        "doc_id",
        "cnt",
        F.array(*[F.col(f"a{g}") for g in range(n_groups)]).alias("phi"),
        F.array(*[F.col(f"b{g}") for g in range(n_groups)]).alias("plo"),
    )

    def assemble(arrname):
        mask = (1 << _PACK_FIELD) - 1
        return F.expr(
            f"aggregate(sequence(0, {_WORD_BITS - 1}), cast(0 as bigint), "
            f"(acc, j) -> acc + IF("
            f"2 * ((element_at({arrname}, cast(j / {_PACK_PER} as int) + 1) "
            f">> ({_PACK_FIELD} * (j % {_PACK_PER}))) & {mask}) > cnt, "
            f"shiftleft(cast(1 as bigint), j), cast(0 as bigint)))"
        )

    return packed.select(
        "doc_id",
        assemble("phi").alias("simhash_hi"),
        assemble("plo").alias("simhash_lo"),
    )


# ------------------------------------------------------------ n-gram Jaccard

JACCARD_THRESHOLD = 0.5


@query(
    "neardup_ngram_jaccard",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f""",
    sets AS (
      SELECT doc_id, list(substr(md5(shingle), 1, 16)) AS s
      FROM sh GROUP BY doc_id
    )
    SELECT doc1, doc2,
      CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
        / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s))) AS jaccard
    FROM cand
    JOIN sets s1 ON s1.doc_id = doc1
    JOIN sets s2 ON s2.doc_id = doc2
    WHERE CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
        / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s)))
        >= {JACCARD_THRESHOLD}
    """,
)
def neardup_ngram_jaccard(spark, sf_dir):
    """The full near-dup pipeline: MinHash-LSH candidate pairs -> exact
    3-gram Jaccard verification -> threshold. This is the at-scale shape:
    the exact verification only ever touches LSH candidates, never all
    pairs. Verification compares per-doc SETS OF 64-BIT SHINGLE HASHES
    (collect_set of md5 prefixes, one partial-aggregated shuffle on doc_id)
    rather than joining raw shingle text: the candidate table is tiny, so
    both verification joins broadcast it, and the intersection is a local
    array_intersect — no shingle-text shuffle at any point."""
    d = table(spark, sf_dir, "documents")
    cand = dedup_minhash_lsh_pairs(spark, sf_dir)
    sets_ = (
        shingles_all(d)
        .select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
    )
    a = sets_.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1"))
    b = sets_.select(F.col("doc_id").alias("doc2"), F.col("s").alias("s2"))
    c = F.size(F.array_intersect("s1", "s2"))
    jac = c.cast("double") / (F.size("s1") + F.size("s2") - c)
    return (
        cand.join(a, "doc1")
        .join(b, "doc2")
        .select("doc1", "doc2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


N_VERIFY_BUCKETS = 8


@query(
    "neardup_verify_bucketed",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f""",
    sets AS (
      SELECT doc_id, list(substr(md5(shingle), 1, 16)) AS s
      FROM sh GROUP BY doc_id
    )
    SELECT doc1, doc2,
      CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
        / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s))) AS jaccard
    FROM cand
    JOIN sets s1 ON s1.doc_id = doc1
    JOIN sets s2 ON s2.doc_id = doc2
    WHERE CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
        / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s)))
        >= {JACCARD_THRESHOLD}
    """,
)
def neardup_verify_bucketed(spark, sf_dir):
    """Same answer as neardup_ngram_jaccard, via BUCKETED STORAGE — the
    at-scale verify shape when the candidate table is too big to broadcast:
    the per-doc shingle-hash sets (corpus-sized) and the LSH candidate pairs
    are both written as catalog tables bucketed on the join key with the
    same bucket count, so the shuffles of the dedup pipeline are paid ONCE
    at index-build time. The verify join then reads bucket i of both sides
    and merges locally: the doc1 join is Exchange-free on BOTH sides, and
    the doc2 join re-distributes only the pair-sized stream — the big sets
    table never shuffles again, however many verify batches run against it
    (tests/test_scale_patterns.py::test_bucketed_verify_sets_never_shuffle
    asserts exactly one Exchange in the whole verify plan with broadcast
    disabled)."""
    from ..sources.bucketing import read_bucketed, write_bucketed

    d = table(spark, sf_dir, "documents")
    sets_ = (
        shingles_all(d)
        .select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
    )
    write_bucketed(sets_, "neardup_sets_b", "doc_id",
                   N_VERIFY_BUCKETS, sort_cols="doc_id")
    write_bucketed(
        dedup_minhash_lsh_pairs(spark, sf_dir), "neardup_cand_b", "doc1",
        N_VERIFY_BUCKETS, sort_cols="doc1",
    )
    sb = read_bucketed(spark, "neardup_sets_b")
    cand = read_bucketed(spark, "neardup_cand_b")
    a = sb.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1"))
    b = sb.select(F.col("doc_id").alias("doc2"), F.col("s").alias("s2"))
    c = F.size(F.array_intersect("s1", "s2"))
    jac = c.cast("double") / (F.size("s1") + F.size("s2") - c)
    return (
        cand.join(a, "doc1")
        .join(b, "doc2")
        .select("doc1", "doc2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# -------------------------------------------- SimHash hamming-ball pairs

_SIMHASH_SQL = f"""
    tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tv AS (
      SELECT doc_id,
        ('0x' || substr(md5(token), 1, 8))::BIGINT AS vhi,
        ('0x' || substr(md5(token), 9, 8))::BIGINT AS vlo
      FROM tok
    ),
    bits AS (
      SELECT doc_id, j,
        SUM(CASE WHEN (vhi >> j) & 1 = 1 THEN 1 ELSE -1 END) AS shi,
        SUM(CASE WHEN (vlo >> j) & 1 = 1 THEN 1 ELSE -1 END) AS slo
      FROM tv, UNNEST(range({_WORD_BITS})) AS u(j)
      GROUP BY doc_id, j
    ),
    sig AS (
      SELECT doc_id,
        CAST(SUM(CASE WHEN shi > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS hi,
        CAST(SUM(CASE WHEN slo > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS lo
      FROM bits GROUP BY doc_id
    )
"""

HAMMING_MAX = 3
# Manku et al. (WWW'07) blocking: split the signature into HAMMING_MAX+1
# blocks; <= HAMMING_MAX differing bits touch <= HAMMING_MAX blocks, so at
# least one full block matches exactly. With the 64-bit signature that is
# 4 blocks of 16 bits (2 per word) — 4 candidate rows per doc and 4x65536
# buckets, 256x more selective than the old 32-bit/8-bit-block geometry.
_N_BLOCKS = HAMMING_MAX + 1
_BLOCK_BITS = SIMHASH_BITS // _N_BLOCKS  # 16


@query(
    "dedup_simhash_hamming_pairs",
    oracle=f"""
    WITH {_SIMHASH_SQL},
    blocks AS (
      SELECT doc_id, hi, lo, b,
        CASE WHEN b < 2 THEN (lo >> ({_BLOCK_BITS} * b)) & {(1 << _BLOCK_BITS) - 1}
             ELSE (hi >> ({_BLOCK_BITS} * (b - 2))) & {(1 << _BLOCK_BITS) - 1} END AS key
      FROM sig, UNNEST(range({_N_BLOCKS})) AS u(b)
    ),
    bok AS (
      SELECT b, key FROM blocks GROUP BY b, key
      HAVING COUNT(*) BETWEEN 2 AND {SIMHASH_MAX_BUCKET}
    )
    SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
      CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
    FROM blocks a
    JOIN bok ON bok.b = a.b AND bok.key = a.key
    JOIN blocks b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= {HAMMING_MAX}
    """,
)
def dedup_simhash_hamming_pairs(spark, sf_dir):
    """Near-dup pairs with simhash hamming distance <= 3, found WITHOUT an
    all-pairs scan: by pigeonhole, any pair within distance 3 agrees
    exactly on at least one of the 4 16-bit blocks of the 64-bit
    signature, so candidates come from equality buckets on (block, key).

    Blocking per Manku et al.: d+1 = 4 blocks of 16 bits. Candidate
    generation is a codegen'd self-join on (block, key); an array-collect
    variant (as in minhash LSH) loses badly here because interpreted
    higher-order-function pair generation over the large buckets this
    simhash-degenerate synthetic corpus produces (tiny vocabulary) is
    10-20x slower than the join. Buckets past SIMHASH_MAX_BUCKET are
    dropped before the self-join (skew guard, mirrored in the oracle);
    hamming = popcount(hi XOR hi') + popcount(lo XOR lo') filters false
    candidates exactly."""
    sig = dedup_simhash(spark, sf_dir)
    mask = (1 << _BLOCK_BITS) - 1
    block_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.expr(
                    f"(simhash_lo >> {_BLOCK_BITS * b}) & {mask}"
                    if b < 2
                    else f"(simhash_hi >> {_BLOCK_BITS * (b - 2)}) & {mask}"
                ).alias("key"),
            )
            for b in range(_N_BLOCKS)
        ]
    )
    blocks = sig.select(
        "doc_id", "simhash_hi", "simhash_lo", F.explode(block_keys).alias("bk")
    ).select(
        "doc_id",
        "simhash_hi",
        "simhash_lo",
        F.col("bk.b").alias("b"),
        F.col("bk.key").alias("key"),
    )
    bok = (
        blocks.groupBy("b", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= SIMHASH_MAX_BUCKET))
        .select("b", "key")
    )
    gated = blocks.join(bok, ["b", "key"])
    a, b = gated.alias("a"), gated.alias("b")
    ham = F.bit_count(
        F.col("a.simhash_hi").bitwiseXOR(F.col("b.simhash_hi"))
    ) + F.bit_count(F.col("a.simhash_lo").bitwiseXOR(F.col("b.simhash_lo")))
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= HAMMING_MAX)
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


# ----------------------------------------------------- winnowing fingerprint

WINNOW_WINDOW = 4  # hashes per winnowing window


@query(
    "dedup_winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {SHINGLE_K}
    ),
    kgrams AS (
      SELECT doc_id, i AS pos,
        substr(md5(array_to_string(t[i+1:i+{SHINGLE_K}], ' ')), 1, 16) AS h
      FROM toks, UNNEST(range(len(t) - {SHINGLE_K - 1})) AS u(i)
    ),
    winnowed AS (
      SELECT doc_id,
        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN {WINNOW_WINDOW - 1} PRECEDING AND CURRENT ROW) AS fp
      FROM kgrams
    )
    SELECT DISTINCT doc_id, fp FROM winnowed
    """,
)
def dedup_winnowing_fingerprints(spark, sf_dir):
    """Winnowing (Schleimer et al., SIGMOD'03): positional k-gram hashes,
    sliding-window minimum, distinct minima = the document's fingerprint
    set. Entirely map-side + one per-doc window sort — linear in corpus.
    Fingerprint overlap between docs localizes shared passages (the
    containment analogue of MinHash's resemblance)."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= SHINGLE_K
    )
    kgrams = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - SHINGLE_K),
                lambda i: F.substring(
                    F.md5(F.concat_ws(" ", F.slice("t", i + 1, SHINGLE_K))), 1, 16
                ),
            )
        ).alias("pos", "h"),
    )
    w = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_WINDOW - 1), W.currentRow)
    )
    return kgrams.select("doc_id", F.min("h").over(w).alias("fp")).distinct()


# ----------------------------------------------- edit-distance verification

LEV_PREFIX = 40


@query(
    "neardup_levenshtein_verify",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f"""
    SELECT doc1, doc2,
      CAST(levenshtein(substr(d1.text, 1, {LEV_PREFIX}),
                       substr(d2.text, 1, {LEV_PREFIX})) AS INTEGER) AS lev
    FROM cand
    JOIN documents d1 ON d1.doc_id = doc1
    JOIN documents d2 ON d2.doc_id = doc2
    """,
)
def neardup_levenshtein_verify(spark, sf_dir):
    """Edit-distance verification of LSH candidates (character-level, on a
    40-char prefix — full-text levenshtein is O(len^2) per pair and only
    ever runs on candidates, never all pairs). Integer output, identical in
    any engine. The third verifier in the family: Jaccard (set overlap),
    hamming (simhash bits), levenshtein (character edits)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, LEV_PREFIX).alias("prefix")
    )
    cand = dedup_minhash_lsh_pairs(spark, sf_dir)
    d1 = d.select(F.col("doc_id").alias("doc1"), F.col("prefix").alias("p1"))
    d2 = d.select(F.col("doc_id").alias("doc2"), F.col("prefix").alias("p2"))
    return (
        cand.join(d1, "doc1")
        .join(d2, "doc2")
        .select("doc1", "doc2", F.levenshtein("p1", "p2").cast("int").alias("lev"))
    )


# ----------------------------------------------------- paragraph-level dedup

# Corpus-wide duplicated-passage removal (the CCNet / C4 "dedup at the
# paragraph level" step). The synthetic documents carry no newlines, so a
# "paragraph" here is a fixed non-overlapping window of PARA_TOKENS tokens —
# the same segmentation a byte-window passage dedup uses when documents
# aren't line-structured.
PARA_TOKENS = 10


def _para_segments(spark, sf_dir):
    """doc_id, seg_idx, seg_hash for every non-overlapping PARA_TOKENS-token
    segment. Pure map-side: split once, explode an index sequence, slice.
    Rows carry md5(segment), never segment text — at 100 TB the shuffle that
    follows moves 16-byte keys, not corpus bytes."""
    d = table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    nseg = F.floor((F.size(t) + F.lit(PARA_TOKENS - 1)) / F.lit(PARA_TOKENS)).cast("int")
    segs = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(t, i * PARA_TOKENS + 1, PARA_TOKENS))
                ),
            )
        ).alias("seg_idx", "seg_hash"),
    )
    return segs


_PARA_SEGS_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    segs AS (
      SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
        md5(array_to_string(
          t[i * {PARA_TOKENS} + 1 : i * {PARA_TOKENS} + {PARA_TOKENS}], ' '))
          AS seg_hash
      FROM toks,
           UNNEST(range((len(t) + {PARA_TOKENS - 1}) // {PARA_TOKENS})) AS u(i)
    )
"""


@query(
    "dedup_paragraphs",
    oracle=_PARA_SEGS_SQL
    + """
    SELECT seg_hash,
      CAST(count(*) AS BIGINT) AS n_copies,
      min(doc_id) AS canonical_doc
    FROM segs
    GROUP BY seg_hash
    HAVING count(*) > 1
    """,
)
def dedup_paragraphs(spark, sf_dir):
    """Cross-document duplicated passages: segment hashes occurring more
    than once corpus-wide, with copy count and the lowest doc_id as the
    canonical holder. One partial-aggregated shuffle on the 16-byte hash —
    the exact shape of a 100 TB passage-dedup pass (the heavy lifting is
    map-side segmentation + hashing; the group-by sees only hashes)."""
    segs = _para_segments(spark, sf_dir)
    return (
        segs.groupBy("seg_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .where(F.col("n_copies") > 1)
    )


@query(
    "paragraph_dedup_stats",
    oracle=_PARA_SEGS_SQL
    + """
    , per AS (
      SELECT d.source, s.seg_hash
      FROM segs s JOIN documents d USING (doc_id)
    )
    SELECT source,
      CAST(count(*) AS BIGINT) AS total_segments,
      CAST(count(DISTINCT seg_hash) AS BIGINT) AS distinct_segments,
      round(1.0 - count(DISTINCT seg_hash) / count(*), 6) AS dup_ratio
    FROM per
    GROUP BY source
    """,
)
def paragraph_dedup_stats(spark, sf_dir):
    """Per-source duplication audit: what fraction of passages in each
    source slice are repeats. The number a corpus owner reads before
    deciding whether a source is worth keeping. Join to recover `source`
    is broadcast (documents' (doc_id, source) projection is small relative
    to the exploded segment stream; at full scale carry source through
    _para_segments instead — one column, no join)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    segs = _para_segments(spark, sf_dir)
    per = segs.join(F.broadcast(d), "doc_id").select("source", "seg_hash")
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_segments"),
        F.countDistinct("seg_hash").alias("distinct_segments"),
        F.round(
            1.0 - F.countDistinct("seg_hash") / F.count(F.lit(1)), 6
        ).alias("dup_ratio"),
    )


# ------------------------------------------------- prefix-filter near-dup

# PPJoin-style set-similarity self-join: order each doc's shingle set by
# GLOBAL rarity; any pair with Jaccard >= t must collide inside each side's
# first |S| - ceil(t*|S|) + 1 shingles, so only those prefix shingles
# generate candidates. Algorithmically independent of MinHash-LSH (exact
# recall at the threshold — no probabilistic misses) and cheaper than it
# when sets are small; the classic companion in a dedup toolbox.
PF_JACCARD_T = 0.5
PF_MAX_BUCKET = 50  # same skew contract as LSH_MAX_BUCKET


def _pf_oracle_sql() -> str:
    return f"""
    dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    ranked AS (
      SELECT s.doc_id, s.shingle, z.sz,
        row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.shingle)
          AS rnk
      FROM sh s JOIN dfc d USING (shingle) JOIN sz z USING (doc_id)
    ),
    pref AS (
      SELECT doc_id, shingle FROM ranked
      WHERE rnk <= sz - CAST(ceil({PF_JACCARD_T} * sz) AS BIGINT) + 1
    ),
    pok AS (
      SELECT shingle FROM pref GROUP BY shingle
      HAVING COUNT(*) BETWEEN 2 AND {PF_MAX_BUCKET}
    ),
    pcand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM pref a JOIN pok USING (shingle)
      JOIN pref b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT doc1, doc2, count(*) AS i
      FROM pcand
      JOIN sh s1 ON s1.doc_id = doc1
      JOIN sh s2 ON s2.doc_id = doc2 AND s1.shingle = s2.shingle
      GROUP BY doc1, doc2
    )
    SELECT doc1, doc2,
      round(i / (z1.sz + z2.sz - i), 6) AS jaccard
    FROM inter
    JOIN sz z1 ON z1.doc_id = doc1
    JOIN sz z2 ON z2.doc_id = doc2
    WHERE i / (z1.sz + z2.sz - i) >= {PF_JACCARD_T}
    """


@query(
    "neardup_prefix_filter_pairs",
    oracle="WITH" + _SHINGLES_SQL + "," + _pf_oracle_sql(),
)
def neardup_prefix_filter_pairs(spark, sf_dir):
    """Prefix-filtered exact-Jaccard pairs at t >= 0.5.

    Plan: shingle distinct (1 shuffle) -> global df counts joined back
    BROADCAST (vocabulary-sized) -> per-doc rarity rank (1 window shuffle
    on doc_id) -> prefix shingles only -> bucket-grouped pair generation
    on the shingle key (1 shuffle; same sorted-array in-bucket explode and
    size cap as the LSH path — rare shingles make tiny buckets, and the
    cap bounds the hot ones) -> exact Jaccard verify on candidates only.
    Recall is EXACT at the threshold (prefix-filter completeness), unlike
    MinHash-LSH's probabilistic recall — proven against brute force in
    tests/test_operators.py::test_prefix_filter_finds_all_pairs.

    The distinct shingle table feeds FIVE consumers (df counts, set sizes,
    rarity ranking, both verify legs), so it is computed once and persisted
    — same recompute fix as part_pagerank/part_triangle_counts; without it
    the shingle shuffle runs five times (15-exchange plan)."""
    d = table(spark, sf_dir, "documents")
    sh = shingles(d).persist()
    sh.count()  # materialize: every consumer below reads the cache
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    w = W_.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = (
        sh.join(F.broadcast(dfc), "shingle")
        .join(F.broadcast(sz), "doc_id")
        .select(
            "doc_id",
            "shingle",
            "sz",
            F.row_number().over(w).alias("rnk"),
        )
    )
    pref = ranked.where(
        F.col("rnk")
        <= F.col("sz") - F.ceil(PF_JACCARD_T * F.col("sz")).cast("bigint") + 1
    ).select("doc_id", "shingle")
    buckets = (
        pref.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= PF_MAX_BUCKET))
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x AS doc1, y AS doc2))))"
                )
            ).alias("p")
        )
        .select("p.doc1", "p.doc2")
        .distinct()
    )
    s1 = sh.select(F.col("doc_id").alias("doc1"), F.col("shingle").alias("sg1"))
    s2 = sh.select(F.col("doc_id").alias("d2"), F.col("shingle").alias("sg2"))
    inter = (
        cand.join(s1, "doc1")
        .join(s2, (F.col("doc2") == F.col("d2")) & (F.col("sg1") == F.col("sg2")))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    z1 = sz.select(F.col("doc_id").alias("doc1"), F.col("sz").alias("sz1"))
    z2 = sz.select(F.col("doc_id").alias("doc2"), F.col("sz").alias("sz2"))
    jac = F.col("i") / (F.col("sz1") + F.col("sz2") - F.col("i"))
    return (
        inter.join(F.broadcast(z1), "doc1")
        .join(F.broadcast(z2), "doc2")
        .where(jac >= PF_JACCARD_T)
        .select("doc1", "doc2", F.round(jac, 6).alias("jaccard"))
    )


# --------------------------------------------------- asymmetric containment

CONTAINMENT_THRESHOLD = 0.7


@query(
    "neardup_containment",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f""",
    sets AS (
      SELECT doc_id, list(substr(md5(shingle), 1, 16)) AS s
      FROM sh GROUP BY doc_id
    )
    SELECT doc1, doc2,
      CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) / len(s1.s)
        AS containment_1_in_2,
      CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) / len(s2.s)
        AS containment_2_in_1
    FROM cand
    JOIN sets s1 ON s1.doc_id = doc1
    JOIN sets s2 ON s2.doc_id = doc2
    WHERE greatest(
        CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) / len(s1.s),
        CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE) / len(s2.s))
      >= {CONTAINMENT_THRESHOLD}
    """,
)
def neardup_containment(spark, sf_dir):
    """Asymmetric containment verification over the LSH candidates:
    C(A in B) = |A∩B| / |A| — catches SUBSUMED documents (a quote, an
    excerpt, a doc embedded in a larger one) that symmetric Jaccard
    misses, because the union in Jaccard's denominator punishes size
    mismatch. The classic case: a 50-shingle doc fully contained in a
    500-shingle doc has Jaccard ~0.1 but containment 1.0. Same plan shape
    as neardup_ngram_jaccard (hashed shingle sets, broadcast candidate
    joins, local array_intersect); a pair survives when EITHER direction
    crosses the threshold, and both directions are reported so the caller
    can keep the superset doc."""
    d = table(spark, sf_dir, "documents")
    cand = dedup_minhash_lsh_pairs(spark, sf_dir)
    sets_ = (
        shingles_all(d)
        .select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
    )
    a = sets_.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1"))
    b = sets_.select(F.col("doc_id").alias("doc2"), F.col("s").alias("s2"))
    c = F.size(F.array_intersect("s1", "s2")).cast("double")
    c12 = c / F.size("s1")
    c21 = c / F.size("s2")
    return (
        cand.join(a, "doc1")
        .join(b, "doc2")
        .select(
            "doc1",
            "doc2",
            c12.alias("containment_1_in_2"),
            c21.alias("containment_2_in_1"),
        )
        .filter(
            F.greatest("containment_1_in_2", "containment_2_in_1")
            >= CONTAINMENT_THRESHOLD
        )
    )


# ------------------------------------------- incremental dedup vs an index

BATCH_MOD = 10  # doc_id % 10 == 0 plays the "incoming batch"; rest = index


@query(
    "dedup_incremental_vs_index",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + f""",
    bands AS (
      {_bands_sql()}
    ),
    nb AS (SELECT * FROM bands WHERE doc_id % {BATCH_MOD} = 0),
    ib AS (SELECT * FROM bands WHERE doc_id % {BATCH_MOD} <> 0),
    iok AS (
      SELECT band, key FROM ib GROUP BY band, key
      HAVING COUNT(*) <= {LSH_MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_doc, i.doc_id AS dup_of
      FROM nb n
      JOIN iok ON iok.band = n.band AND iok.key = n.key
      JOIN ib i ON i.band = n.band AND i.key = n.key
    ),
    sets AS (
      SELECT doc_id, list(substr(md5(shingle), 1, 16)) AS s
      FROM sh GROUP BY doc_id
    )
    SELECT new_doc, dup_of,
      CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
        / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s))) AS jaccard
    FROM cand
    JOIN sets s1 ON s1.doc_id = new_doc
    JOIN sets s2 ON s2.doc_id = dup_of
    WHERE CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
        / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s)))
        >= {JACCARD_THRESHOLD}
    """,
)
def dedup_incremental_vs_index(spark, sf_dir):
    """Incremental ingestion dedup: an incoming batch (doc_id % {BATCH_MOD}
    == 0 stands in for "today's crawl") is checked against the EXISTING
    corpus index without ever comparing index docs to each other — the
    production shape where the index's band table is precomputed and
    stored (bucketed by (band, key), see sources/bucketing.py) and each
    ingest only shuffles the new batch's bands. The asymmetric join is
    what makes daily ingestion O(batch), not O(corpus): index-side hot
    buckets past LSH_MAX_BUCKET are dropped (same skew guard, mirrored in
    the oracle), and the exact-Jaccard verify touches only surviving
    candidates with broadcast hash-set intersections."""
    d = table(spark, sf_dir, "documents")
    sig = corpus_minhash_signatures(spark, sf_dir)
    n_bands = N_MINHASH // LSH_BAND_SIZE
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            *[
                                F.col(f"h{b * LSH_BAND_SIZE + j}")
                                for j in range(LSH_BAND_SIZE)
                            ]
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    nb = bands.filter(F.col("doc_id") % BATCH_MOD == 0)
    ib = bands.filter(F.col("doc_id") % BATCH_MOD != 0)
    iok = (
        ib.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= LSH_MAX_BUCKET)
        .select("band", "key")
    )
    cand = (
        nb.join(iok, ["band", "key"])
        .join(
            ib.select(
                F.col("doc_id").alias("dup_of"), "band", "key"
            ),
            ["band", "key"],
        )
        .select(F.col("doc_id").alias("new_doc"), "dup_of")
        .distinct()
    )
    sets_ = (
        shingles_all(d)
        .select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
    )
    s1 = sets_.select(F.col("doc_id").alias("new_doc"), F.col("s").alias("s1"))
    s2 = sets_.select(F.col("doc_id").alias("dup_of"), F.col("s").alias("s2"))
    c = F.size(F.array_intersect("s1", "s2"))
    jac = c.cast("double") / (F.size("s1") + F.size("s2") - c)
    return (
        cand.join(s1, "new_doc")
        .join(s2, "dup_of")
        .select("new_doc", "dup_of", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# ------------------------------------------------- split leakage check

@query(
    "split_leakage_check",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f""",
    sets AS (
      SELECT doc_id, list(substr(md5(shingle), 1, 16)) AS s
      FROM sh GROUP BY doc_id
    ),
    verified AS (
      SELECT doc1, doc2,
        CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
          / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s))) AS jaccard
      FROM cand
      JOIN sets s1 ON s1.doc_id = doc1
      JOIN sets s2 ON s2.doc_id = doc2
      WHERE CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
          / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s)))
          >= {JACCARD_THRESHOLD}
    ),
    sp AS (
      SELECT doc_id,
        CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                  % 100 < 90 THEN 'train' ELSE 'test' END AS split
      FROM documents
    )
    SELECT
      CASE WHEN a.split = 'test' THEN doc1 ELSE doc2 END AS test_doc,
      CASE WHEN a.split = 'test' THEN doc2 ELSE doc1 END AS train_doc,
      jaccard
    FROM verified
    JOIN sp a ON a.doc_id = doc1
    JOIN sp b ON b.doc_id = doc2
    WHERE a.split <> b.split
    """,
)
def split_leakage_check(spark, sf_dir):
    """Train/test leakage audit: near-duplicate pairs that STRADDLE the
    deterministic 90/10 split — a test document with a near-dup in train
    is contamination that inflates eval scores, and is invisible to both
    the dedup pass (which sees only pairs) and the split (which sees only
    ids). Composes two verified pipelines: LSH+Jaccard near-dup pairs and
    the md5 split; the split table joins back broadcast-sized onto the
    (already tiny) verified-pair set, so the audit costs two map-side
    joins beyond the dedup pass it would piggyback on. Output is oriented
    (test_doc, train_doc)."""
    from .pipeline import split_train_test

    pairs = neardup_ngram_jaccard(spark, sf_dir)
    sp = split_train_test(spark, sf_dir)
    a = sp.select(F.col("doc_id").alias("doc1"), F.col("split").alias("split1"))
    b = sp.select(F.col("doc_id").alias("doc2"), F.col("split").alias("split2"))
    return (
        pairs.join(F.broadcast(a), "doc1")
        .join(F.broadcast(b), "doc2")
        .filter(F.col("split1") != F.col("split2"))
        .select(
            F.when(F.col("split1") == "test", F.col("doc1"))
            .otherwise(F.col("doc2"))
            .alias("test_doc"),
            F.when(F.col("split1") == "test", F.col("doc2"))
            .otherwise(F.col("doc1"))
            .alias("train_doc"),
            "jaccard",
        )
    )


@query(
    "dedup_rate_by_source",
    oracle="""
    WITH h AS (
      SELECT source, md5(text) AS hh, doc_id FROM documents
    ),
    k AS (
      SELECT source, hh, CAST(COUNT(*) AS BIGINT) AS n,
        MIN(doc_id) AS keeper
      FROM h GROUP BY source, hh
    )
    SELECT source,
      CAST(SUM(n) AS BIGINT) AS n_docs,
      CAST(COUNT(*) AS BIGINT) AS n_unique,
      CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dupes,
      round(CAST(SUM(n) - COUNT(*) AS DOUBLE) / SUM(n), 8) AS dup_frac
    FROM k GROUP BY source
    """,
)
def dedup_rate_by_source(spark, sf_dir):
    """Per-source exact-duplication report: docs, uniques, dupes and the
    duplicate fraction — the dataset-card number that tells you which
    crawl source is flooding the corpus with copies BEFORE you spend the
    near-dup budget on it. Hash-keyed per-source aggregate (content never
    shuffles, only md5 keys), then a source-level rollup of counts."""
    d = table(spark, sf_dir, "documents")
    k = (
        d.select("source", F.md5("text").alias("hh"), "doc_id")
        .groupBy("source", "hh")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper"))
    )
    return k.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_unique"),
        (F.sum("n") - F.count(F.lit(1))).alias("n_dupes"),
        F.round(
            (F.sum("n") - F.count(F.lit(1))).cast("double") / F.sum("n"), 8
        ).alias("dup_frac"),
    )


# -------------------------------------- MinHash Jaccard estimation error

@query(
    "minhash_jaccard_estimate",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f""",
    est AS (
      SELECT doc1, doc2,
        CAST({" + ".join(f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH))}
          AS DOUBLE) / {N_MINHASH} AS jaccard_est
      FROM cand JOIN sig a ON a.doc_id = doc1 JOIN sig b ON b.doc_id = doc2
    ),
    sets AS (
      SELECT doc_id, list(substr(md5(shingle), 1, 16)) AS s
      FROM sh GROUP BY doc_id
    )
    SELECT doc1, doc2, jaccard_est,
      CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
        / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s)))
        AS jaccard_exact,
      round(abs(jaccard_est
        - CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
          / (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s)))), 8)
        AS abs_err
    FROM est
    JOIN sets s1 ON s1.doc_id = doc1
    JOIN sets s2 ON s2.doc_id = doc2
    """,
)
def minhash_jaccard_estimate(spark, sf_dir):
    """MinHash-estimated vs exact Jaccard on every LSH candidate pair —
    the estimator-quality evidence behind the whole MinHash stack
    (fraction of agreeing signature slots IS the unbiased Jaccard
    estimate; its error at {N_MINHASH} hashes tells you whether to spend
    more signature bytes). Signatures join broadcast onto the tiny
    candidate set; the exact side reuses the hashed-set verify machinery.
    At scale this runs on a sampled candidate subset — the estimator
    audit, not the dedup path itself."""
    d = table(spark, sf_dir, "documents")
    cand = dedup_minhash_lsh_pairs(spark, sf_dir)
    sig = corpus_minhash_signatures(spark, sf_dir)
    a = sig.select(
        F.col("doc_id").alias("doc1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    est = (
        cand.join(F.broadcast(a), "doc1")
        .join(F.broadcast(b), "doc2")
        .select(
            "doc1", "doc2",
            (agree.cast("double") / N_MINHASH).alias("jaccard_est"),
        )
    )
    sets_ = (
        shingles_all(d)
        .select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
    )
    s1 = sets_.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1"))
    s2 = sets_.select(F.col("doc_id").alias("doc2"), F.col("s").alias("s2"))
    c = F.size(F.array_intersect("s1", "s2"))
    exact = c.cast("double") / (F.size("s1") + F.size("s2") - c)
    return (
        est.join(F.broadcast(s1), "doc1")
        .join(F.broadcast(s2), "doc2")
        .select(
            "doc1", "doc2", "jaccard_est",
            exact.alias("jaccard_exact"),
            F.round(F.abs(F.col("jaccard_est") - exact), 8).alias("abs_err"),
        )
    )


@query(
    "dedup_minhash_bbit_estimate",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f"""
    SELECT doc1, doc2,
      CAST({" + ".join(f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH))}
        AS BIGINT) AS k_full,
      CAST({" + ".join(
          f"CASE WHEN ('0x' || substr(a.h{i}, 8, 1))::BIGINT % 2 = "
          f"('0x' || substr(b.h{i}, 8, 1))::BIGINT % 2 THEN 1 ELSE 0 END"
          for i in range(N_MINHASH)
      )} AS BIGINT) AS k_bit,
      CAST({" + ".join(f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH))}
        AS DOUBLE) / {N_MINHASH} AS est_full,
      CAST({" + ".join(
          f"CASE WHEN ('0x' || substr(a.h{i}, 8, 1))::BIGINT % 2 = "
          f"('0x' || substr(b.h{i}, 8, 1))::BIGINT % 2 THEN 1 ELSE 0 END"
          for i in range(N_MINHASH)
      )} AS DOUBLE) / {N_MINHASH} AS match_frac_1bit,
      greatest(2.0 * (CAST({" + ".join(
          f"CASE WHEN ('0x' || substr(a.h{i}, 8, 1))::BIGINT % 2 = "
          f"('0x' || substr(b.h{i}, 8, 1))::BIGINT % 2 THEN 1 ELSE 0 END"
          for i in range(N_MINHASH)
      )} AS DOUBLE) / {N_MINHASH}) - 1.0, 0.0) AS est_1bit
    FROM cand JOIN sig a ON a.doc_id = doc1 JOIN sig b ON b.doc_id = doc2
    """,
)
def dedup_minhash_bbit_estimate(spark, sf_dir):
    """b-bit minwise hashing audit (Li & Konig 2010) on the LSH candidate
    pairs: keep only the LAST BIT of each minhash value (32x smaller
    signatures than the 8-hex-char slots) and compare the 1-bit match
    fraction — whose expectation is J + (1-J)/2 — and its debiased
    estimator max(2*E - 1, 0) against the full-width estimator. The
    storage/accuracy tradeoff every petabyte-scale dedup deployment
    actually makes: at 100 TB the signature table itself is a large
    fraction of dedup I/O, and this query is the evidence for shrinking
    it.

    Determinism: match counts are exact integers; every reported double
    is a dyadic rational (k/8, 2k/8-1) representable exactly in binary —
    no rounding surface. The bit is the parity of the minhash slice's
    last hex char, identical in both engines. Signatures broadcast onto
    the bounded candidate set, same shape as minhash_jaccard_estimate."""
    d = table(spark, sf_dir, "documents")
    cand = dedup_minhash_lsh_pairs(spark, sf_dir)
    sig = corpus_minhash_signatures(spark, sf_dir)
    a = sig.select(
        F.col("doc_id").alias("doc1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )

    def bit(c):
        return F.conv(F.substring(F.col(c), 8, 1), 16, 10).cast("int") % 2

    k_full = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    k_bit = sum(
        F.when(bit(f"a{i}") == bit(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    match_1bit = k_bit.cast("double") / N_MINHASH
    return (
        cand.join(F.broadcast(a), "doc1")
        .join(F.broadcast(b), "doc2")
        .select(
            "doc1",
            "doc2",
            k_full.cast("bigint").alias("k_full"),
            k_bit.cast("bigint").alias("k_bit"),
            (k_full.cast("double") / N_MINHASH).alias("est_full"),
            match_1bit.alias("match_frac_1bit"),
            F.greatest(
                F.lit(2.0) * match_1bit - F.lit(1.0), F.lit(0.0)
            ).alias("est_1bit"),
        )
    )


# ------------------------------------------------------ LSH recall audit

# Brute-force ground-truth sample: an ABSOLUTE doc cap, not a fraction —
# a % sample scales the O(n^2) truth set quadratically with the corpus
# (50% of 10^9 docs is 10^17 pairs); 600 docs is ~1.8e5 pairs forever.
AUDIT_DOC_CAP = 600

@query(
    "lsh_recall_audit",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f""",
    sets AS (
      SELECT doc_id, list(substr(md5(shingle), 1, 16)) AS s
      FROM sh WHERE doc_id < {AUDIT_DOC_CAP} GROUP BY doc_id
    ),
    truth AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
          >= {JACCARD_THRESHOLD}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
      CAST(SUM(CASE WHEN cand.doc1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_caught,
      round(CAST(SUM(CASE WHEN cand.doc1 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*), 8) AS recall
    FROM truth LEFT JOIN cand
      ON cand.doc1 = truth.doc1 AND cand.doc2 = truth.doc2
    """,
)
def lsh_recall_audit(spark, sf_dir):
    """Measured LSH recall at the Jaccard threshold: ground truth is the
    brute-force O(n^2) pair set on an ABSOLUTE cap of the first
    AUDIT_DOC_CAP doc ids (a fractional sample would scale the truth set
    quadratically with the corpus — same cap discipline as the ANN
    recall harnesses), and recall is the fraction of true pairs the
    banded-LSH candidate generator catches. THE number a dedup pipeline
    reports before anyone trusts its candidate pruning; the b=4, r=2
    S-curve predicts ~1 at J>=0.5, and the audit checks reality against
    that. Sample-side sets broadcast; the LEFT join is truth-sized."""
    d = table(spark, sf_dir, "documents")
    sub = d.filter(F.col("doc_id") < AUDIT_DOC_CAP)
    sets_ = (
        shingles_all(sub)
        .select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
    )
    a = sets_.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1"))
    b = sets_.select(F.col("doc_id").alias("doc2"), F.col("s").alias("s2"))
    c = F.size(F.array_intersect("s1", "s2"))
    jac = c.cast("double") / (F.size("s1") + F.size("s2") - c)
    truth = (
        a.join(F.broadcast(b), F.col("doc1") < F.col("doc2"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc1", "doc2")
    )
    cand = dedup_minhash_lsh_pairs(spark, sf_dir).withColumn(
        "caught", F.lit(1)
    )
    j = truth.join(F.broadcast(cand), ["doc1", "doc2"], "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.sum(F.coalesce("caught", F.lit(0))).alias("n_caught"),
        F.round(
            F.sum(F.coalesce("caught", F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            8,
        ).alias("recall"),
    )


# ------------------------------------------------- empirical LSH S-curve

@query(
    "lsh_scurve_empirical",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f""",
    sets AS (
      SELECT doc_id, list(substr(md5(shingle), 1, 16)) AS s
      FROM sh WHERE doc_id < {AUDIT_DOC_CAP} GROUP BY doc_id
    ),
    allpairs AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2,
        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    ),
    binned AS (
      SELECT least(9, CAST(floor(j * 10) AS INTEGER)) AS j_bin,
        CASE WHEN cand.doc1 IS NOT NULL THEN 1 ELSE 0 END AS caught
      FROM allpairs LEFT JOIN cand
        ON cand.doc1 = allpairs.doc1 AND cand.doc2 = allpairs.doc2
      WHERE j > 0
    )
    SELECT j_bin, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      CAST(SUM(caught) AS BIGINT) AS n_caught,
      round(CAST(SUM(caught) AS DOUBLE) / COUNT(*), 8) AS catch_rate
    FROM binned GROUP BY j_bin
    """,
)
def lsh_scurve_empirical(spark, sf_dir):
    """Empirical LSH S-curve: candidate catch rate per Jaccard decile over
    the brute-forced 50% sample — the measured counterpart of the b=4/r=2
    theory curve 1-(1-j^2)^4 (near 0 below j~0.2, near 1 above j~0.5).
    This is how you TUNE (b, r): plot measured vs intended curve before
    committing a 100 TB dedup run to a banding choice. Same bounded-
    sample discipline as lsh_recall_audit; the bin aggregate is
    10 rows."""
    d = table(spark, sf_dir, "documents")
    sub = d.filter(F.col("doc_id") < AUDIT_DOC_CAP)
    sets_ = (
        shingles_all(sub)
        .select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
    )
    a = sets_.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1"))
    b = sets_.select(F.col("doc_id").alias("doc2"), F.col("s").alias("s2"))
    c = F.size(F.array_intersect("s1", "s2"))
    jac = c.cast("double") / (F.size("s1") + F.size("s2") - c)
    allpairs = (
        a.join(F.broadcast(b), F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", jac.alias("j"))
        .filter(F.col("j") > 0)
    )
    cand = dedup_minhash_lsh_pairs(spark, sf_dir).withColumn("caught", F.lit(1))
    binned = allpairs.join(F.broadcast(cand), ["doc1", "doc2"], "left").select(
        F.least(F.lit(9), F.floor(F.col("j") * 10).cast("int")).alias("j_bin"),
        F.coalesce("caught", F.lit(0)).alias("caught"),
    )
    return binned.groupBy("j_bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("caught").alias("n_caught"),
        F.round(F.sum("caught").cast("double") / F.count(F.lit(1)), 8).alias(
            "catch_rate"
        ),
    )


# ----------------------------------------- token-set (vocabulary) dedup


@query(
    "dedup_token_set",
    oracle="""
    WITH k AS (
      SELECT doc_id,
        md5(array_to_string(
          list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
          AS set_key
      FROM documents
    )
    SELECT set_key,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id
    FROM k GROUP BY set_key HAVING COUNT(*) > 1
    """,
)
def dedup_token_set(spark, sf_dir):
    """Vocabulary-identity dedup: documents whose lowercased DISTINCT
    token sets are identical — catches reordered or repetition-padded
    boilerplate (Jaccard similarity exactly 1.0) that byte-level exact
    dedup misses, deterministically and without MinHash's probabilistic
    machinery. The dedup key is md5 over the sorted distinct-token array
    (binary string sort in both engines), so — like dedup_exact — the one
    shuffle moves 16-byte keys, never document bytes. Groups keep the
    minimum doc_id as the canonical survivor."""
    d = table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat_ws(
            " ", F.sort_array(F.array_distinct(F.split(F.lower("text"), " ")))
        )
    )
    return (
        d.groupBy(key.alias("set_key"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------- LSH precision audit


@query(
    "lsh_precision_audit",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f""",
    sets AS (
      SELECT doc_id, list(substr(md5(shingle), 1, 16)) AS s
      FROM sh GROUP BY doc_id
    ),
    scored AS (
      SELECT cand.doc1, cand.doc2,
        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
      FROM cand
      JOIN sets a ON a.doc_id = cand.doc1
      JOIN sets b ON b.doc_id = cand.doc2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
      CAST(SUM(CASE WHEN j >= {JACCARD_THRESHOLD} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_true,
      round(CAST(SUM(CASE WHEN j >= {JACCARD_THRESHOLD} THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 8) AS precision,
      CAST(SUM(CAST(round(j, 8) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
        AS mean_jaccard
    FROM scored
    """,
)
def lsh_precision_audit(spark, sf_dir):
    """Measured LSH PRECISION — the complement of lsh_recall_audit: of
    the candidate pairs the banded generator emits, what fraction are
    true near-duplicates at the Jaccard threshold, and what is their
    mean similarity. Together the two audits locate the operating point
    on the S-curve (recall says what pruning misses; precision prices
    the exact-verify stage that follows, since every false candidate
    costs a full Jaccard computation at 100 TB). Exact Jaccard is
    computed ONLY for candidates — never all pairs; shingle sets join by
    doc key; the report is a 1-row rollup with round-then-decimal-sum
    mean."""
    cand = dedup_minhash_lsh_pairs(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    sets_ = (
        shingles_all(d)
        .select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
    )
    a = sets_.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1"))
    b = sets_.select(F.col("doc_id").alias("doc2"), F.col("s").alias("s2"))
    c = F.size(F.array_intersect("s1", "s2"))
    jac = (c.cast("double") / (F.size("s1") + F.size("s2") - c)).alias("j")
    scored = cand.join(a, "doc1").join(b, "doc2").select(jac)
    hit = (F.col("j") >= JACCARD_THRESHOLD).cast("int")
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(hit).cast("bigint").alias("n_true"),
        F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 8).alias(
            "precision"
        ),
        (
            F.sum(F.round("j", 8).cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_jaccard"),
    )


# ------------------------------------------------ simhash bit balance


@query(
    "simhash_bit_balance",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tv AS (
      SELECT doc_id,
        ('0x' || substr(md5(token), 1, 8))::BIGINT AS vhi,
        ('0x' || substr(md5(token), 9, 8))::BIGINT AS vlo
      FROM tok
    ),
    bits AS (
      SELECT doc_id, j,
        SUM(CASE WHEN (vhi >> j) & 1 = 1 THEN 1 ELSE -1 END) AS shi,
        SUM(CASE WHEN (vlo >> j) & 1 = 1 THEN 1 ELSE -1 END) AS slo
      FROM tv, UNNEST(range({_WORD_BITS})) AS u(j)
      GROUP BY doc_id, j
    ),
    t AS (SELECT COUNT(DISTINCT doc_id) AS n FROM bits),
    b AS (
      SELECT j + {_WORD_BITS} AS bit,
        SUM(CASE WHEN shi > 0 THEN 1 ELSE 0 END) AS ones
      FROM bits GROUP BY j
      UNION ALL
      SELECT j AS bit, SUM(CASE WHEN slo > 0 THEN 1 ELSE 0 END) AS ones
      FROM bits GROUP BY j
    )
    SELECT CAST(bit AS INTEGER) AS bit,
      CAST(ones AS BIGINT) AS n_ones,
      ones / CAST(n AS DOUBLE) AS frac_ones,
      abs(ones / CAST(n AS DOUBLE) - 0.5) AS bias
    FROM b CROSS JOIN t
    """,
)
def simhash_bit_balance(spark, sf_dir):
    """Hash-health audit of the SimHash family: per bit position, the
    fraction of documents with that bit set. An unbiased hash sits near
    0.5 per bit; systematic bias (here: REAL on this tiny-vocabulary
    synthetic corpus) concentrates signatures into few Hamming blocks
    and quadratically inflates the candidate join — this audit is the
    early warning that sized SIMHASH_MAX_BUCKET. Reuses the signature
    pipeline, explodes the 64 bits over the DOC-count table (not the
    token table — the explode dedup_simhash itself avoids), one 64-row
    rollup."""
    sig = dedup_simhash(spark, sf_dir)
    t = F.broadcast(sig.agg(F.count(F.lit(1)).alias("n")))
    bits = sig.select(
        F.explode(F.sequence(F.lit(0), F.lit(_WORD_BITS - 1))).alias("j"),
        "simhash_hi",
        "simhash_lo",
    )
    hi = bits.groupBy((F.col("j") + _WORD_BITS).alias("bit")).agg(
        F.sum(F.expr("shiftright(simhash_hi, j) & 1")).alias("ones")
    )
    lo = bits.groupBy(F.col("j").alias("bit")).agg(
        F.sum(F.expr("shiftright(simhash_lo, j) & 1")).alias("ones")
    )
    b = hi.unionAll(lo)
    return b.crossJoin(t).select(
        F.col("bit").cast("int").alias("bit"),
        F.col("ones").cast("bigint").alias("n_ones"),
        (F.col("ones") / F.col("n").cast("double")).alias("frac_ones"),
        F.abs(F.col("ones") / F.col("n").cast("double") - 0.5).alias("bias"),
    )


# --------------------------------------------- simhash block skew audit


@query(
    "simhash_block_size_hist",
    oracle=f"""
    WITH {_SIMHASH_SQL},
    blocks AS (
      SELECT doc_id, b,
        CASE WHEN b < 2 THEN (lo >> ({_BLOCK_BITS} * b)) & {(1 << _BLOCK_BITS) - 1}
             ELSE (hi >> ({_BLOCK_BITS} * (b - 2))) & {(1 << _BLOCK_BITS) - 1} END AS key
      FROM sig, UNNEST(range({_N_BLOCKS})) AS u(b)
    ),
    bs AS (SELECT b, key, COUNT(*) AS n FROM blocks GROUP BY b, key)
    SELECT CAST(n AS BIGINT) AS bucket_size,
      CAST(COUNT(*) AS BIGINT) AS n_buckets,
      n > {SIMHASH_MAX_BUCKET} AS over_cap
    FROM bs GROUP BY n
    """,
)
def simhash_block_size_hist(spark, sf_dir):
    """Block-bucket size distribution for the Manku Hamming join — the
    skew evidence behind SIMHASH_MAX_BUCKET (candidate pairs grow as
    bucket_size^2/2, so the tail of this histogram IS the join cost
    model; over_cap marks buckets the pair generator drops). Pairs with
    simhash_bit_balance: bit bias is the cause, this is the effect. Two
    partial-aggregated shuffles over 16-byte keys."""
    sig = dedup_simhash(spark, sf_dir)
    mask = (1 << _BLOCK_BITS) - 1
    block_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.expr(
                    f"(simhash_lo >> {_BLOCK_BITS * b}) & {mask}"
                    if b < 2
                    else f"(simhash_hi >> {_BLOCK_BITS * (b - 2)}) & {mask}"
                ).alias("key"),
            )
            for b in range(_N_BLOCKS)
        ]
    )
    bs = (
        sig.select(F.explode(block_keys).alias("bk"))
        .select(F.col("bk.b").alias("b"), F.col("bk.key").alias("key"))
        .groupBy("b", "key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return bs.groupBy(F.col("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets")
    ).select(
        F.col("n").cast("bigint").alias("bucket_size"),
        "n_buckets",
        (F.col("n") > SIMHASH_MAX_BUCKET).alias("over_cap"),
    )


# ------------------------------------------------- dedup funnel report


@query(
    "dedup_funnel_report",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + f""",
    sets AS (
      SELECT doc_id, list(substr(md5(shingle), 1, 16)) AS s
      FROM sh GROUP BY doc_id
    ),
    verified AS (
      SELECT cand.doc1 FROM cand
      JOIN sets a ON a.doc_id = cand.doc1
      JOIN sets b ON b.doc_id = cand.doc2
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
          >= {JACCARD_THRESHOLD}
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
      (SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) FROM documents)
        AS n_unique_exact,
      (SELECT CAST(COUNT(DISTINCT md5(array_to_string(
         list_sort(list_distinct(string_split(lower(text), ' '))), ' ')))
         AS BIGINT) FROM documents) AS n_unique_token_set,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_lsh_candidate_pairs,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM verified)
        AS n_verified_neardup_pairs
    """,
)
def dedup_funnel_report(spark, sf_dir):
    """The dedup funnel in one row: corpus size -> unique byte-exact
    texts -> unique token SETS -> LSH candidate pairs -> exact-verified
    near-dup pairs. This is the headline a curation run reports (each
    stage's delta is documents the cheaper stage could not catch), and
    the sanity chain is monotone by construction: n_docs >=
    n_unique_exact >= n_unique_token_set, candidates >= verified. Every
    stage reuses the production operator's exact key/candidate logic
    (md5 text keys, sorted-distinct-token keys, banded-LSH candidates,
    Jaccard verify on candidates only) — five bounded aggregates, no
    new scale surface."""
    d = table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    n_exact = d.agg(
        F.count_distinct(F.md5("text")).cast("bigint").alias("n_unique_exact")
    )
    set_key = F.md5(
        F.concat_ws(
            " ", F.sort_array(F.array_distinct(F.split(F.lower("text"), " ")))
        )
    )
    n_set = d.agg(
        F.count_distinct(set_key).cast("bigint").alias("n_unique_token_set")
    )
    cand = dedup_minhash_lsh_pairs(spark, sf_dir)
    n_cand = cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lsh_candidate_pairs")
    )
    sets_ = (
        shingles_all(d)
        .select("doc_id", F.substring(F.md5("shingle"), 1, 16).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("s"))
    )
    a = sets_.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1"))
    b = sets_.select(F.col("doc_id").alias("doc2"), F.col("s").alias("s2"))
    c = F.size(F.array_intersect("s1", "s2"))
    jac = c.cast("double") / (F.size("s1") + F.size("s2") - c)
    n_ver = (
        cand.join(a, "doc1")
        .join(b, "doc2")
        .filter(jac >= JACCARD_THRESHOLD)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_verified_neardup_pairs")
        )
    )
    return (
        n_docs.crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(n_set))
        .crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_ver))
    )


# ----------------- maximal duplicated token spans (substring dedup)

SPAN_SHINGLE_N = 8


@query(
    "neardup_duplicated_spans",
    oracle=f"""
    WITH ds AS (
      SELECT doc_id, i,
        md5(array_to_string(w[i:i + {SPAN_SHINGLE_N - 1}], ' ')) AS sh
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
            FROM documents),
        UNNEST(generate_series(1, len(w) - {SPAN_SHINGLE_N - 1})) AS u(i)
    ),
    dupsh AS (
      SELECT sh FROM (
        SELECT sh, COUNT(DISTINCT doc_id) AS nd FROM ds GROUP BY sh
      ) WHERE nd > 1
    ),
    dup AS (SELECT doc_id, i FROM ds JOIN dupsh USING (sh)),
    isl AS (
      SELECT doc_id, i,
        i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      FROM dup
    )
    SELECT doc_id,
      CAST(MIN(i) AS BIGINT) AS span_start,
      CAST(MAX(i) + {SPAN_SHINGLE_N - 1} AS BIGINT) AS span_end,
      CAST(MAX(i) - MIN(i) + {SPAN_SHINGLE_N} AS BIGINT) AS span_tokens
    FROM isl GROUP BY doc_id, grp
    """,
)
def neardup_duplicated_spans(spark, sf_dir):
    """Substring-level dedup signal (the Lee et al. 2021 'Deduplicating
    Training Data' shape, approximated at shingle granularity): for each
    document, the MAXIMAL token spans covered by {SPAN_SHINGLE_N}-gram
    shingles that also occur in at least one other document — the spans a
    span-cut dedup pass would excise, with 1-based token coordinates.

    Runs of consecutive duplicated shingle positions are merged with the
    gaps-and-islands idiom (position minus row_number is constant within
    a run), so two overlapping duplicated shingles report as one span,
    not two.

    Scale shape: shingles travel as md5 keys; doc-frequency is one
    shuffle over distinct (doc, shingle); the duplicated-position join is
    sh-keyed; island numbering windows are partitioned by doc_id (never
    a global sort). Each stage is keyed and combining — the same plan
    survives a 100x corpus. The shingle explode fans out of the one-task
    single-row-group scan."""
    d = fanout(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    n = SPAN_SHINGLE_N
    ds = d.select(
        "doc_id", F.split(F.lower("text"), " ").alias("w")
    ).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(w) >= {n} THEN "
                f"transform(sequence(1, size(w) - {n - 1}), "
                f"i -> md5(array_join(slice(w, i, {n}), ' '))) "
                f"ELSE array() END"
            )
        ).alias("pos0", "sh"),
    ).select("doc_id", (F.col("pos0") + 1).alias("i"), "sh")
    dupsh = (
        ds.select("doc_id", "sh")
        .distinct()
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") > 1)
        .select("sh")
    )
    dup = ds.join(dupsh, "sh").select("doc_id", "i")
    grp = F.col("i") - F.row_number().over(
        W_.partitionBy("doc_id").orderBy("i")
    )
    isl = dup.select("doc_id", "i", grp.alias("grp"))
    return isl.groupBy("doc_id", "grp").agg(
        F.min("i").cast("bigint").alias("span_start"),
        (F.max("i") + (n - 1)).cast("bigint").alias("span_end"),
        (F.max("i") - F.min("i") + n).cast("bigint").alias("span_tokens"),
    ).drop("grp")


# ------------------ cross-source contamination / overlap matrix


@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH ds AS (
      SELECT DISTINCT source,
        md5(array_to_string(w[i:i + {SPAN_SHINGLE_N - 1}], ' ')) AS sh
      FROM (SELECT source, string_split(lower(text), ' ') AS w
            FROM documents),
        UNNEST(generate_series(1, len(w) - {SPAN_SHINGLE_N - 1})) AS u(i)
    ),
    per AS (SELECT source, COUNT(*) AS n_sh FROM ds GROUP BY source),
    pair AS (
      SELECT a.source AS source_a, b.source AS source_b,
        COUNT(*) AS n_shared
      FROM ds a JOIN ds b ON a.sh = b.sh AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, CAST(n_shared AS BIGINT) AS n_shared_shingles,
      round(n_shared / CAST(pa.n_sh + pb.n_sh - n_shared AS DOUBLE), 8)
        AS shingle_jaccard
    FROM pair
    JOIN per pa ON pa.source = source_a
    JOIN per pb ON pb.source = source_b
    """,
)
def source_overlap_matrix(spark, sf_dir):
    """Pairwise cross-source contamination matrix: for every pair of
    sources, how many distinct {SPAN_SHINGLE_N}-gram shingles they share
    and the Jaccard of their shingle sets — the leakage map consulted
    before declaring one source a held-out eval set.

    The oracle states it as a shingle self-join; the Spark plan never
    self-joins: per shingle, the distinct source set is collected
    (bounded by the source cardinality, ~dozens) and pairs are generated
    IN-ROW from the sorted array — the same in-bucket pair-generation
    idiom as the LSH candidate stage, so shuffle volume is one row per
    (shingle, source-pair), not |ds|^2 probes. The shingle explode fans
    out of the one-task single-row-group scan (keyed on doc_id — source
    has too few distinct values to spread)."""
    d = fanout(
        table(spark, sf_dir, "documents").select("doc_id", "source", "text"),
        "doc_id",
    )
    n = SPAN_SHINGLE_N
    ds = (
        d.select("source", F.split(F.lower("text"), " ").alias("w"))
        .select(
            "source",
            F.explode(
                F.expr(
                    f"CASE WHEN size(w) >= {n} THEN "
                    f"transform(sequence(1, size(w) - {n - 1}), "
                    f"i -> md5(array_join(slice(w, i, {n}), ' '))) "
                    f"ELSE array() END"
                )
            ).alias("sh"),
        )
        .distinct()
    )
    per = ds.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    srcs = ds.groupBy("sh").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    pairs_expr = F.expr(
        "flatten(transform(sequence(1, size(ss) - 1), "
        "i -> transform(sequence(i + 1, size(ss)), "
        "j -> struct(element_at(ss, i) AS a, element_at(ss, j) AS b))))"
    )
    pair = (
        srcs.filter(F.size("ss") >= 2)
        .select(F.explode(pairs_expr).alias("p"))
        .groupBy(
            F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pa = per.select(F.col("source").alias("source_a"), F.col("n_sh").alias("na"))
    pb = per.select(F.col("source").alias("source_b"), F.col("n_sh").alias("nb"))
    return (
        pair.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("bigint").alias("n_shared_shingles"),
            F.round(
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared")).cast("double"),
                8,
            ).alias("shingle_jaccard"),
        )
    )


# ----------------- MinHash banding configuration sweep (index tuning)

LSH_SWEEP_CONFIGS = [(8, 1), (4, 2), (2, 4), (1, 8)]  # (bands, rows) over 8 sigs


def _sweep_cfg_sql(nb: int, r: int) -> str:
    selects = []
    for b in range(nb):
        key = " || ".join(f"h{b * r + j}" for j in range(r))
        selects.append(f"SELECT doc_id, {b} AS band, {key} AS key FROM sig")
    bands = "\n        UNION ALL\n        ".join(selects)
    return f"""
      SELECT {nb} AS bands, {r} AS rows_per_band,
        CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs
      FROM (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM ({bands}) a
        JOIN ({bands}) b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        JOIN (SELECT band, key FROM ({bands}) GROUP BY band, key
              HAVING COUNT(*) BETWEEN 2 AND {LSH_MAX_BUCKET}) ok
          ON ok.band = a.band AND ok.key = a.key
      )"""


@query(
    "dedup_lsh_config_sweep",
    oracle=f"""
    WITH docs AS (SELECT doc_id, lower(text) AS text FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
        array_to_string(w[i:i + {SHINGLE_K - 1}], ' ') AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
        UNNEST(generate_series(1, len(w) - {SHINGLE_K - 1})) AS u(i)
    ),
    {{sig}}
    SELECT bands, rows_per_band,
      round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS threshold_50pct,
      n_candidate_pairs
    FROM (
      {{cfgs}}
    )
    """.format(
        sig=_minhash_sig_sql(),
        cfgs="\n      UNION ALL\n      ".join(
            _sweep_cfg_sql(nb, r) for nb, r in LSH_SWEEP_CONFIGS
        ),
    ),
)
def dedup_lsh_config_sweep(spark, sf_dir):
    """MinHash-LSH index tuning table: for every (bands x rows) split of
    the 8-hash signature, the theoretical 50%-recall similarity
    threshold (1/b)^(1/r) and the ACTUAL candidate-pair count on this
    corpus — the two columns an index designer trades off (more bands =
    lower threshold = more candidates to verify). The production config
    (4x2) sits in the middle of the sweep; this query is the evidence
    for why.

    Signatures are computed ONCE and persisted; each config re-bands the
    8 cached values (a per-row projection) and counts its candidates via
    the same capped in-bucket pair generation as the production
    pipeline — the sweep costs four bucket shuffles over signature rows,
    never four corpus re-scans."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.lower("text").alias("text")
    )
    sig = minhash_signatures(d).persist()
    outs = []
    for nb, r in LSH_SWEEP_CONFIGS:
        band_rows = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat(
                        *[F.col(f"h{b * r + j}") for j in range(r)]
                    ).alias("key"),
                )
                for b in range(nb)
            ]
        )
        bands = sig.select("doc_id", F.explode(band_rows).alias("bk")).select(
            "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        )
        buckets = (
            bands.groupBy("band", "key")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") >= 2) & (F.size("ids") <= LSH_MAX_BUCKET))
        )
        pairs = (
            buckets.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids) - i - 1), "
                        "y -> struct(x AS doc1, y AS doc2))))"
                    )
                ).alias("p")
            )
            .select("p.doc1", "p.doc2")
            .distinct()
        )
        outs.append(
            pairs.agg(
                F.lit(nb).alias("bands"),
                F.lit(r).alias("rows_per_band"),
                F.round(
                    F.pow(F.lit(1.0) / nb, F.lit(1.0) / r), 6
                ).alias("threshold_50pct"),
                F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"),
            )
        )
    from functools import reduce as _reduce

    return _reduce(lambda a, b: a.unionAll(b), outs).select(
        "bands", "rows_per_band", "threshold_50pct", "n_candidate_pairs"
    )


@query(
    "duplicate_vs_unique_quality",
    oracle="""
    WITH g AS (
      SELECT doc_id, n_chars,
        len(list_distinct(string_split(lower(text), ' ')))
          / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS ttr,
        COUNT(*) OVER (PARTITION BY md5(text)) > 1 AS is_dup
      FROM documents
    )
    SELECT CASE WHEN is_dup THEN 'duplicated' ELSE 'unique' END AS cohort,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      round(AVG(CAST(n_chars AS DOUBLE)), 6) AS mean_chars,
      round(AVG(ttr), 8) AS mean_type_token_ratio
    FROM g GROUP BY 1
    """,
)
def duplicate_vs_unique_quality(spark, sf_dir):
    """The 'are duplicates junk?' interaction report: documents that have
    at least one exact copy vs singletons, compared on length and
    type-token ratio — the evidence behind ordering dedup BEFORE quality
    filtering (if dups skew low-quality, dedup removes them for free; if
    not, quality thresholds must not be tuned on the deduped corpus).
    The dup flag is the same md5-key shuffle as dedup_exact (never the
    text bytes); per-doc signals are pure maps; the report is a 2-row
    rollup."""
    d = table(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    sig = d.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("nc"),
        (F.size(F.array_distinct(w)) / F.size(w).cast("double")).alias("ttr"),
        F.md5("text").alias("h"),
    )
    counts = sig.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    return (
        sig.join(counts, "h")
        .groupBy(
            F.when(F.col("c") > 1, "duplicated")
            .otherwise("unique")
            .alias("cohort")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("nc"), 6).alias("mean_chars"),
            F.round(F.avg("ttr"), 8).alias("mean_type_token_ratio"),
        )
    )


# ------------------------------------- idf-weighted Jaccard verify


@query(
    "neardup_weighted_jaccard",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + ","
    + _cand_sql()
    + """,
    nn AS (SELECT COUNT(DISTINCT doc_id)::BIGINT AS n FROM sh),
    idf AS (
      SELECT shingle,
        round(ln(CAST(n AS DOUBLE) / COUNT(DISTINCT doc_id)), 8) AS w
      FROM sh CROSS JOIN nn GROUP BY shingle, n
    ),
    s1 AS (
      SELECT doc1, doc2, shingle FROM sh JOIN cand ON sh.doc_id = doc1
    ),
    s2 AS (
      SELECT doc1, doc2, shingle FROM sh JOIN cand ON sh.doc_id = doc2
    ),
    u AS (
      SELECT COALESCE(s1.doc1, s2.doc1) AS doc1,
        COALESCE(s1.doc2, s2.doc2) AS doc2,
        COALESCE(s1.shingle, s2.shingle) AS shingle,
        (s1.shingle IS NOT NULL AND s2.shingle IS NOT NULL) AS both_
      FROM s1 FULL OUTER JOIN s2
        ON s1.doc1 = s2.doc1 AND s1.doc2 = s2.doc2
        AND s1.shingle = s2.shingle
    ),
    scored AS (
      SELECT doc1, doc2,
        CAST(SUM(CASE WHEN both_
          THEN CAST(w AS DECIMAL(38,10)) ELSE 0 END) AS DOUBLE) AS iw,
        CAST(SUM(CAST(w AS DECIMAL(38,10))) AS DOUBLE) AS uw,
        SUM(CASE WHEN both_ THEN 1 ELSE 0 END)::BIGINT AS n_common,
        COUNT(*)::BIGINT AS n_union
      FROM u JOIN idf USING (shingle) GROUP BY doc1, doc2
    )
    SELECT doc1, doc2, n_common, n_union,
      round(CAST(n_common AS DOUBLE) / n_union, 8) AS jaccard,
      round(iw / uw, 8) AS weighted_jaccard
    FROM scored
    """,
)
def neardup_weighted_jaccard(spark, sf_dir):
    """idf-weighted Jaccard over the LSH candidate pairs: shared RARE
    shingles count for more than shared boilerplate, so two docs that
    overlap only on stock phrases score low even when their plain
    Jaccard clears the threshold — the refinement between
    neardup_ngram_jaccard (unweighted) and boilerplate_ngrams (which
    identifies the stock phrases this op discounts). Reports both
    scores per pair for direct comparison.

    Scale shape: the exact verify only ever touches LSH candidates.
    Candidate pairs broadcast onto the shingle table twice (doc1/doc2
    legs), the full-outer merge runs on the bounded pair-shingle rows,
    and the idf join is the one shingle-keyed shuffle — the same
    shuffle the document-frequency aggregate already pays. Weights are
    rounded then decimal-summed per pair."""
    d = table(spark, sf_dir, "documents")
    cand = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc1", "doc2")
    sh = shingles_all(d).distinct()
    nn = F.broadcast(
        sh.agg(F.count_distinct("doc_id").cast("bigint").alias("n"))
    )
    idf = (
        sh.crossJoin(nn)
        .groupBy("shingle", "n")
        .agg(F.count_distinct("doc_id").alias("df"))
        .select(
            "shingle",
            F.round(
                F.log(F.col("n").cast("double") / F.col("df")), 8
            ).alias("w"),
        )
    )
    bc = F.broadcast(cand)
    s1 = sh.join(bc, F.col("doc_id") == F.col("doc1")).select(
        "doc1", "doc2", "shingle"
    )
    s2 = sh.join(bc, F.col("doc_id") == F.col("doc2")).select(
        F.col("doc1").alias("d1"),
        F.col("doc2").alias("d2"),
        F.col("shingle").alias("sh2"),
    )
    u = s1.join(
        s2,
        (F.col("doc1") == F.col("d1"))
        & (F.col("doc2") == F.col("d2"))
        & (F.col("shingle") == F.col("sh2")),
        "full_outer",
    ).select(
        F.coalesce("doc1", "d1").alias("doc1"),
        F.coalesce("doc2", "d2").alias("doc2"),
        F.coalesce("shingle", "sh2").alias("shingle"),
        (F.col("shingle").isNotNull() & F.col("sh2").isNotNull()).alias(
            "both_"
        ),
    )
    scored = u.join(idf, "shingle").groupBy("doc1", "doc2").agg(
        F.sum(
            F.when(F.col("both_"), F.col("w").cast("decimal(38,10)"))
            .otherwise(F.lit(0).cast("decimal(38,10)"))
        )
        .cast("double")
        .alias("iw"),
        F.sum(F.col("w").cast("decimal(38,10)")).cast("double").alias("uw"),
        F.sum(F.col("both_").cast("int")).cast("bigint").alias("n_common"),
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
    )
    return scored.select(
        "doc1",
        "doc2",
        "n_common",
        "n_union",
        F.round(
            F.col("n_common").cast("double") / F.col("n_union"), 8
        ).alias("jaccard"),
        F.round(F.col("iw") / F.col("uw"), 8).alias("weighted_jaccard"),
    )


# ----------------------------- exact duplicated-span accounting (Lee et al.)

SPAN_W = 20


@query(
    "doc_duplicated_span_fraction",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    wins AS (
      SELECT doc_id, w.pos AS pos, w.h AS h FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(toks) - {SPAN_W} + 2),
          i -> {{'pos': i,
                 'h': md5(array_to_string(toks[i:i+{SPAN_W}-1], ' '))}})) AS w
        FROM t
      )
    ),
    duph AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) > 1),
    dw AS (
      SELECT wins.doc_id, wins.pos AS s, wins.pos + {SPAN_W} - 1 AS e
      FROM wins JOIN duph ON wins.h = duph.h
    ),
    isl AS (
      SELECT doc_id, s, e,
        CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
          THEN 1 ELSE 0 END AS brk
      FROM dw
    ),
    isl2 AS (
      SELECT doc_id, s, e,
        SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
          ROWS UNBOUNDED PRECEDING) AS gid
      FROM isl
    ),
    spans AS (
      SELECT doc_id, gid, MIN(s) AS ms, MAX(e) AS me
      FROM isl2 GROUP BY doc_id, gid
    ),
    per_doc AS (
      SELECT doc_id, CAST(SUM(me - ms + 1) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
      CAST(len(t.toks) AS BIGINT) AS n_tokens,
      COALESCE(per_doc.dup_tokens, 0) AS dup_tokens,
      round(CAST(COALESCE(per_doc.dup_tokens, 0) AS DOUBLE) / len(t.toks), 8)
        AS dup_fraction
    FROM t LEFT JOIN per_doc ON t.doc_id = per_doc.doc_id
    """,
)
def doc_duplicated_span_fraction(spark, sf_dir):
    """Exact duplicated-span accounting per document (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): every
    20-token window is hashed; windows whose hash repeats ANYWHERE in the
    corpus are duplicated; overlapping duplicated windows merge into
    maximal spans (gaps-and-islands over running max end), and each doc
    reports how many of its tokens sit inside a duplicated span. The
    exact complement to MinHash/SimHash doc-level near-dup: finds the
    boilerplate and quotation SPANS those doc-level methods dilute away,
    and dup_fraction is the usual threshold for span-level filtering.

    Scale shape: window hashing is IN-ROW (transform over the token
    array, map-side explode — positions come along for free, no
    positional self-join); the only corpus-size shuffles are the hash
    rollup (partial-aggregated, hashes not text) and the hash-keyed flag
    join-back; span merging is one per-doc window over the (small)
    duplicated subset. On a real corpus the window hash would drop to a
    64-bit rolling hash — md5 here matches the cross-engine oracle."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    wstructs = F.transform(
        seq_asc(F.lit(1), F.size("toks") - SPAN_W + 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.array_join(F.slice("toks", i, SPAN_W), " ")).alias("h"),
        ),
    )
    guarded = F.when(F.size("toks") >= SPAN_W, wstructs).otherwise(
        F.array().cast("array<struct<pos:int,h:string>>")
    )
    wins = d.select("doc_id", F.explode(guarded).alias("w")).select(
        "doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h")
    )
    duph = wins.groupBy("h").agg(F.count(F.lit(1)).alias("c")).filter(
        F.col("c") > 1
    ).select("h")
    dw = wins.join(duph, "h").select(
        "doc_id", F.col("pos").alias("s"), (F.col("pos") + SPAN_W - 1).alias("e")
    )
    prev_max = F.max("e").over(
        W_.partitionBy("doc_id").orderBy("s").rowsBetween(W_.unboundedPreceding, -1)
    )
    isl = dw.withColumn(
        "brk",
        F.when(F.col("s") > F.coalesce(prev_max, F.lit(-1)), 1).otherwise(0),
    ).withColumn(
        "gid",
        F.sum("brk").over(
            W_.partitionBy("doc_id").orderBy("s").rowsBetween(W_.unboundedPreceding, 0)
        ),
    )
    per_doc = (
        isl.groupBy("doc_id", "gid")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .groupBy("doc_id")
        .agg(F.sum(F.col("me") - F.col("ms") + 1).cast("bigint").alias("dup_tokens"))
    )
    return (
        d.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0).cast("bigint")).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0).cast("bigint")).cast("double")
                / F.col("n_tokens"),
                8,
            ).alias("dup_fraction"),
        )
    )


# ------------------------------------------- content-defined chunking (CDC)

CDC_WINDOW = 8  # rolling-hash window (chars)
CDC_MASK = 64  # boundary when window-hash % CDC_MASK == 0 -> ~64-char chunks


def _cdc_cut_points(d):
    """Candidate cut positions for the CDC kernel: (doc_id, text, cut) with
    one row per boundary (window-hash rule) plus the len(text) sentinel.
    Factored out so the bisecting diagnostics (cdc_diag_*) check the exact
    same intermediate the report builds on."""
    n = F.length("text")
    # seq_asc: sub-window-length documents must get ZERO window positions
    # (DuckDB range() emptiness), not Spark's descending phantom cuts.
    window_ends = seq_asc(F.lit(CDC_WINDOW), n)
    return d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "text",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.filter(
                        window_ends,
                        # h % 64 == 0 over the first 32 md5 bits <=> the low
                        # 6 bits of hex chars 7-8 are zero <=> that byte is
                        # one of 00/40/80/c0. Comparing the hex STRING keeps
                        # the predicate identical across engines (no
                        # hex->integer cast, the one construct that proved
                        # DuckDB-build-sensitive in round 5's driver run).
                        lambda i: F.substring(
                            F.md5(
                                F.substring(
                                    "text", (i - CDC_WINDOW + 1).cast("int"), CDC_WINDOW
                                )
                            ),
                            7,
                            2,
                        ).isin("00", "40", "80", "c0"),
                    ),
                    F.array(n),
                )
            )
        ).alias("cut"),
    )


def _cdc_chunk_table(d):
    """Shared CDC kernel: split each ``text`` into content-defined chunks.

    A position ``i`` (1-based end of an 8-char window) is a cut point when
    the window hash satisfies ``h % CDC_MASK == 0`` — the mask-only gear-CDC
    rule (no min/max clamp: true min-size suppression is sequential state,
    and the expected-size divisor already bounds chunk length
    probabilistically). Cut points are a PURE FUNCTION of local bytes, so
    inserting a prefix shifts chunk *positions* but re-synchronizes chunk
    *contents* after the first boundary — the shift-resilience fixed-size
    chunking lacks (verified by the invariant test).

    Shape: one in-row transform generates window hashes (no token explode
    shuffle), cut points explode to O(len/CDC_MASK) rows per doc, and the
    chunk spans come from a per-doc lag window — corpus-linear, no global
    state. Returns (doc_id, chunk_idx, chunk_len, chunk_hash).
    """
    from pyspark.sql import Window as W

    # candidate cut positions: window end i in [CDC_WINDOW, len], plus the
    # sentinel len(text) so the tail always closes a chunk
    cuts = _cdc_cut_points(d)
    w = W.partitionBy("doc_id").orderBy("cut")
    spans = cuts.select(
        "doc_id",
        "text",
        (F.coalesce(F.lag("cut").over(w), F.lit(0)) + 1).alias("s"),
        F.col("cut").alias("e"),
        (F.row_number().over(w)).alias("chunk_idx"),
    )
    return spans.select(
        "doc_id",
        "chunk_idx",
        (F.col("e") - F.col("s") + 1).cast("bigint").alias("chunk_len"),
        F.md5(F.expr("substring(text, s, e - s + 1)")).alias("chunk_hash"),
    )


_CDC_SQL = f"""
    -- Lambda-free cut generation (UNNEST(range)+WHERE, the idiom
    -- dedup_winnowing_fingerprints proved green in the driver env):
    -- correlated list_filter lambdas were the one construct unique to this
    -- oracle across two red driver rounds, so no list lambda appears here.
    cand AS (
      SELECT doc_id, i AS cut
      FROM documents,
        UNNEST(range(CAST({CDC_WINDOW} AS BIGINT), CAST(length(text) AS BIGINT) + 1)) AS u(i)
      WHERE text IS NOT NULL
        AND substr(md5(substr(text, CAST(i - {CDC_WINDOW} + 1 AS INTEGER), {CDC_WINDOW})), 7, 2) IN ('00','40','80','c0')
    ),
    cuts AS (
      SELECT c.doc_id, d.text, c.cut
      FROM (
        SELECT doc_id, cut FROM cand
        UNION
        SELECT doc_id, CAST(length(text) AS BIGINT) AS cut
        FROM documents WHERE text IS NOT NULL
      ) c JOIN documents d USING (doc_id)
    ),
    spans AS (
      SELECT doc_id, text,
        COALESCE(LAG(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) + 1 AS s,
        cut AS e,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cut) AS chunk_idx
      FROM cuts
    ),
    chunks AS (
      SELECT doc_id, chunk_idx,
        CAST(e - s + 1 AS BIGINT) AS chunk_len,
        md5(substr(text, CAST(s AS INTEGER), CAST(e - s + 1 AS INTEGER))) AS chunk_hash
      FROM spans
    )
"""


@query(
    "dedup_cdc_chunks",
    oracle="WITH "
    + _CDC_SQL
    + """
    , per_chunk AS (
      SELECT c.chunk_hash, ANY_VALUE(c.chunk_len) AS chunk_len,
        COUNT(*) AS n_occ, COUNT(DISTINCT c.doc_id) AS n_docs
      FROM chunks c GROUP BY 1
    ),
    per_source AS (
      SELECT d.source, COUNT(*) AS n_chunks,
        COUNT(DISTINCT c.chunk_hash) AS n_distinct,
        CAST(SUM(c.chunk_len) AS BIGINT) AS total_chars
      FROM chunks c JOIN documents d USING (doc_id)
      GROUP BY 1
    ),
    dupchars AS (
      SELECT d.source,
        SUM(CASE WHEN pc.n_occ > 1 THEN c.chunk_len ELSE 0 END) AS dup_chars
      FROM chunks c
      JOIN documents d USING (doc_id)
      JOIN per_chunk pc USING (chunk_hash)
      GROUP BY 1
    )
    SELECT s.source, s.n_chunks, s.n_distinct, s.total_chars,
      CAST(s.n_chunks - s.n_distinct AS BIGINT) AS dup_chunks,
      CAST(dc.dup_chars AS BIGINT) AS dup_chars
    FROM per_source s JOIN dupchars dc USING (source)
    """,
)
def dedup_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup report (gear/Rabin-style CDC, the
    rsync/LBFS/backup-dedup primitive): chunk boundaries are set by the
    CONTENT (rolling window hash % 64 == 0), not by fixed offsets, so an
    insertion near the start of a document only perturbs chunks up to the
    next boundary — the rest re-align and still dedup. Per source: chunk
    counts, distinct chunks, and the exact character count (BIGINT, so the
    cross-engine hash can never float-flake) sitting in chunks that occur
    more than once corpus-wide; dup_chars/total_chars is the dup fraction.

    Scale shape: chunking is in-row (higher-order filter over a char-window
    sequence — no token explode before the hash); the only shuffles are the
    chunk_hash group (dedup-sized keys, never payload text) and the tiny
    per-source rollup. The corpus text is scanned once. The in-row
    chunker (per-char rolling md5) fans out of the one-task
    single-row-group scan — it is the dominant cost of the query."""
    d = table(spark, sf_dir, "documents")
    chunks = _cdc_chunk_table(
        fanout(d.select("doc_id", "text"), "doc_id")
    )
    per_chunk = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    src = d.select("doc_id", "source")
    with_src = chunks.join(src, "doc_id").join(per_chunk, "chunk_hash")
    return (
        with_src.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_hash").alias("n_distinct"),
            F.sum("chunk_len").alias("total_chars"),
            F.sum(
                F.when(F.col("n_occ") > 1, F.col("chunk_len")).otherwise(F.lit(0))
            ).alias("_dup_chars"),
        )
        .select(
            "source",
            "n_chunks",
            "n_distinct",
            "total_chars",
            (F.col("n_chunks") - F.col("n_distinct")).cast("bigint").alias("dup_chunks"),
            # BIGINT, not a rounded DOUBLE fraction: the report stays
            # hash-identical across engines/platforms (round-5 driver flake).
            F.col("_dup_chars").cast("bigint").alias("dup_chars"),
        )
    )


@query(
    "cdc_diag_boundary_hist",
    oracle=f"""
    SELECT substr(md5(substr(text, CAST(i - {CDC_WINDOW} + 1 AS INTEGER), {CDC_WINDOW})), 7, 2) AS boundary_byte,
      COUNT(*) AS n_windows
    FROM documents,
      UNNEST(range(CAST({CDC_WINDOW} AS BIGINT), CAST(length(text) AS BIGINT) + 1)) AS u(i)
    WHERE text IS NOT NULL
      AND substr(md5(substr(text, CAST(i - {CDC_WINDOW} + 1 AS INTEGER), {CDC_WINDOW})), 7, 2) IN ('00','40','80','c0')
    GROUP BY 1
    """,
)
def cdc_diag_boundary_hist(spark, sf_dir):
    """CDC bisecting diagnostic #1 — the boundary PREDICATE alone (per-hex
    counts of matching window positions), no sentinel/distinct/window/chunk
    stages. If dedup_cdc_chunks is red in a grading environment and this is
    too, the divergence is in md5/substr evaluation over the window sweep;
    if this is green the fault is downstream. Registered because the same
    row was red in two consecutive driver artifacts while green locally —
    these three diagnostics mechanically localize the divergent stage."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n = F.length("text")
    window_ends = seq_asc(F.lit(CDC_WINDOW), n)
    wins = d.select("text", F.explode(window_ends).alias("i"))
    b = F.substring(
        F.md5(F.expr(f"substring(text, i - {CDC_WINDOW} + 1, {CDC_WINDOW})")), 7, 2
    )
    return (
        wins.select(b.alias("boundary_byte"))
        .filter(F.col("boundary_byte").isin("00", "40", "80", "c0"))
        .groupBy("boundary_byte")
        .agg(F.count(F.lit(1)).alias("n_windows"))
    )


@query(
    "cdc_diag_cuts_per_source",
    oracle="WITH "
    + _CDC_SQL
    + """
    SELECT d.source, COUNT(*) AS n_cuts,
      CAST(SUM(c.cut) AS BIGINT) AS sum_cut
    FROM cuts c JOIN documents d USING (doc_id)
    GROUP BY 1
    """,
)
def cdc_diag_cuts_per_source(spark, sf_dir):
    """CDC bisecting diagnostic #2 — the CUT SET (per-source count and
    position-sum of cut points, sentinel and distinct applied). Green here
    + red report means the divergence is in the span/lag/chunk-hash stages;
    red here + green #1 means it's in the distinct/sentinel assembly."""
    d = table(spark, sf_dir, "documents")
    cuts = _cdc_cut_points(d)
    src = d.select("doc_id", "source")
    return (
        cuts.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_cuts"),
            F.sum("cut").cast("bigint").alias("sum_cut"),
        )
    )


@query(
    "cdc_diag_chunk_stats",
    oracle="WITH "
    + _CDC_SQL
    + """
    SELECT COUNT(*) AS n_chunks,
      CAST(SUM(chunk_len) AS BIGINT) AS total_chars,
      COUNT(DISTINCT chunk_hash) AS n_distinct_hashes,
      CAST(MIN(chunk_len) AS BIGINT) AS min_len,
      CAST(MAX(chunk_len) AS BIGINT) AS max_len
    FROM chunks
    """,
)
def cdc_diag_chunk_stats(spark, sf_dir):
    """CDC bisecting diagnostic #3 — corpus-global CHUNK stats (count, char
    mass, distinct hashes, length extremes). Green #2 + red here localizes
    to the lag-window span reconstruction or the chunk md5; green here +
    red report localizes to the per-source rollup joins."""
    d = table(spark, sf_dir, "documents")
    chunks = _cdc_chunk_table(d)
    return chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_len").cast("bigint").alias("total_chars"),
        F.countDistinct("chunk_hash").alias("n_distinct_hashes"),
        F.min("chunk_len").cast("bigint").alias("min_len"),
        F.max("chunk_len").cast("bigint").alias("max_len"),
    )


# ------------------------------------- dedup-evasion-robust normalization

# Invisible characters used to perturb hashes without changing rendering:
# zero-width space/non-joiner/joiner, word joiner, BOM/ZWNBSP, soft hyphen.
ZERO_WIDTH = "​‌‍⁠﻿­"
# Common Cyrillic/Greek homoglyphs of Latin letters (dedup/blocklist
# evasion staple); 1:1 so translate() applies it in both engines.
CONFUSABLES_FROM = (
    "аеорсхуі"  # а е о р с х у і
    "АВЕКМНОРСТХ"
    "οΑΒΕΗΚΜΝΟΡΤ"
)
CONFUSABLES_TO = "aeopcxyiABEKMHOPCTXoABEHKMNOPT"


def _evasion_normalize(col):
    """Normalization an adversary can't cheaply route around: strip
    zero-width characters, fold homoglyphs to their Latin targets, then
    casefold and collapse whitespace. A strict superset of the plain
    normalizer in dedup_exact_normalized's spirit but unicode-aware —
    raw-hash dedup misses every one of these perturbations."""
    x = F.translate(col, ZERO_WIDTH, "")
    x = F.translate(x, CONFUSABLES_FROM, CONFUSABLES_TO)
    return F.trim(F.regexp_replace(F.lower(x), "\\s+", " "))


@query(
    "dedup_evasion_robust_groups",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, md5(text) AS raw_key,
        md5(trim(regexp_replace(
          lower(translate(translate(text, '{ZERO_WIDTH}', ''),
                          '{CONFUSABLES_FROM}', '{CONFUSABLES_TO}')),
          '\\s+', ' ', 'g'))) AS norm_key
      FROM documents
    )
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies,
      COUNT(DISTINCT raw_key) AS n_raw_variants
    FROM keyed GROUP BY norm_key
    """,
)
def dedup_evasion_robust_groups(spark, sf_dir):
    """Exact dedup hardened against HASH-EVASION edits: zero-width
    character injection, Cyrillic/Greek homoglyph substitution, case and
    whitespace jitter — the standard tricks spam/SEO text uses to slip
    past md5-exact dedup. One row per evasion-normalized group with its
    copy count and the number of RAW hash variants inside it
    (n_raw_variants > 1 = duplicates the raw pass would have missed).

    Scale shape: identical to exact dedup — the normalization is a
    map-side character transform (translate/lower/regexp, all
    whole-stage-codegen built-ins), and the only shuffle carries 16-byte
    keys, never document bytes. The invariant test drives the kernel with
    actually-perturbed texts; on a clean corpus the report degenerates to
    the exact-dedup histogram, by design."""
    d = table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.md5("text").alias("raw_key"),
        F.md5(_evasion_normalize(F.col("text"))).alias("norm_key"),
    )
    return keyed.groupBy("norm_key").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("raw_key").alias("n_raw_variants"),
    ).select("doc_id", "n_copies", "n_raw_variants")


@query(
    "cdc_chunk_size_distribution",
    oracle="WITH "
    + _CDC_SQL
    + """
    SELECT CAST(floor(chunk_len / 32) AS BIGINT) AS len_bucket_32,
      CAST(COUNT(*) AS BIGINT) AS n_chunks,
      CAST(MIN(chunk_len) AS BIGINT) AS min_len,
      CAST(MAX(chunk_len) AS BIGINT) AS max_len
    FROM chunks GROUP BY 1
    """,
)
def cdc_chunk_size_distribution(spark, sf_dir):
    """Chunk-length histogram (32-char buckets) for the CDC kernel —
    validating gear-CDC's geometric size claim empirically: with a %64
    boundary rule the lengths should concentrate around ~64 chars with a
    geometric tail, and a mass spike at the max bucket would mean the
    mask stopped firing (e.g. a charset change). The observability twin
    of the cdc_diag_* bisecting queries; reuses the shared chunk kernel,
    adds only a bucket rollup."""
    chunks = _cdc_chunk_table(table(spark, sf_dir, "documents"))
    return (
        chunks.groupBy(
            F.floor(F.col("chunk_len") / 32).cast("bigint").alias("len_bucket_32")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.min("chunk_len").cast("bigint").alias("min_len"),
            F.max("chunk_len").cast("bigint").alias("max_len"),
        )
    )


def _cdc_chunks_inrow(d):
    """Window-free CDC chunker: identical output to _cdc_chunk_table but
    computed entirely IN-ROW (sorted cut array -> indexed transform ->
    explode), so it runs under Structured Streaming, where the per-doc
    lag window is unsupported. The batch kernel keeps the window form
    (slightly cheaper on wide docs); the equivalence test pins the two
    together and the streaming twin rides this one."""
    n = F.length("text")
    window_ends = seq_asc(F.lit(CDC_WINDOW), n)
    cuts = F.array_sort(
        F.array_distinct(
            F.concat(
                F.filter(
                    window_ends,
                    lambda i: F.substring(
                        F.md5(
                            F.substring(
                                "text", (i - CDC_WINDOW + 1).cast("int"), CDC_WINDOW
                            )
                        ),
                        7,
                        2,
                    ).isin("00", "40", "80", "c0"),
                ),
                F.array(n),
            )
        )
    )
    spans = F.transform(
        cuts,
        lambda c, i: F.struct(
            (i + 1).alias("chunk_idx"),
            # element_at is 1-based: element_at(cuts, i) for 0-based i is
            # the PREVIOUS cut; the first span starts at 1
            F.when(i == 0, F.lit(1))
            .otherwise(F.element_at(cuts, i) + 1)
            .alias("s"),
            c.alias("e"),
        ),
    )
    return (
        d.filter(F.col("text").isNotNull())
        .select("doc_id", "text", F.explode(spans).alias("sp"))
        .select(
            "doc_id",
            F.col("sp.chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("sp.e") - F.col("sp.s") + 1).cast("bigint").alias("chunk_len"),
            F.md5(
                F.expr("substring(text, sp.s, sp.e - sp.s + 1)")
            ).alias("chunk_hash"),
        )
    )

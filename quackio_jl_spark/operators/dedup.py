"""Deduplication operators for LLM training-data pipelines (driver mandate):
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

from pyspark.sql import functions as F

from ..plans.registry import query, table

N_MINHASH = 8          # 8 hash functions
LSH_BAND_SIZE = 2      # → 4 bands of 2 — catches moderately-similar pairs
SHINGLE_K = 3          # 3-token shingles


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

def shingles(docs):
    """(doc_id, shingle) rows: distinct 3-token shingles per document.

    Map-side only — explode of a per-row generated array, no shuffle until
    the caller aggregates."""
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= SHINGLE_K
    )
    gen = F.transform(
        F.sequence(F.lit(0), F.size("t") - SHINGLE_K),
        lambda i: F.concat_ws(" ", F.slice("t", i + 1, SHINGLE_K)),
    )
    return toks.select("doc_id", F.explode(gen).alias("shingle")).distinct()


# The near-dup pipeline references the shingle set several times (signature
# build, size table, both sides of the verification join). Persisting the
# distinct-shingle table avoids recomputing its explode+shuffle per use —
# at cluster scale this would be a checkpoint/bucketed temp table instead.
_SHINGLE_CACHE: dict = {}


def shingles_cached(spark, sf_dir):
    key = (id(spark), sf_dir)
    if key not in _SHINGLE_CACHE:
        _SHINGLE_CACHE[key] = shingles(table(spark, sf_dir, "documents")).persist()
    return _SHINGLE_CACHE[key]


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
    """Per-doc MinHash signature: h_i = min over shingles of
    md5('<i>:' || shingle) (first 16 hex chars, compared lexicographically —
    identical semantics in any engine with md5)."""
    if sh is None:
        sh = shingles(docs)
    hash_cols = [
        F.min(F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))), 1, 16)).alias(
            f"h{i}"
        )
        for i in range(N_MINHASH)
    ]
    return sh.groupBy("doc_id").agg(*hash_cols)


def _minhash_sig_sql() -> str:
    mins = ",\n        ".join(
        f"MIN(substr(md5('{i}:' || shingle), 1, 16)) AS h{i}" for i in range(N_MINHASH)
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


@query(
    "dedup_minhash_signatures",
    oracle="WITH" + _SHINGLES_SQL + "," + _minhash_sig_sql() + "\n    SELECT * FROM sig",
)
def dedup_minhash_signatures(spark, sf_dir):
    """The MinHash signature table itself (hash-checked against the oracle)."""
    return minhash_signatures(sh=shingles_cached(spark, sf_dir))


@query(
    "dedup_minhash_lsh_pairs",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + f""",
    bands AS (
      {_bands_sql()}
    )
    SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
    FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                             AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    """LSH candidate pairs: docs agreeing on any band of the signature.
    The self-join key is (band, band-hash) — bucket-local, so the shuffle
    fans out by bucket and no all-pairs comparison ever happens."""
    sig = minhash_signatures(sh=shingles_cached(spark, sf_dir))
    n_bands = N_MINHASH // LSH_BAND_SIZE
    band_rows = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(
                    *[F.col(f"h{b * LSH_BAND_SIZE + j}") for j in range(LSH_BAND_SIZE)]
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_rows).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    other = bands.select(
        F.col("doc_id").alias("doc2"), F.col("band").alias("band2"), F.col("key").alias("key2")
    )
    return (
        bands.join(
            other,
            (F.col("band") == F.col("band2"))
            & (F.col("key") == F.col("key2"))
            & (F.col("doc_id") < F.col("doc2")),
        )
        .select(F.col("doc_id").alias("doc1"), "doc2")
        .distinct()
    )


# ------------------------------------------------------------------- SimHash

SIMHASH_BITS = 32  # bits drawn from the first 8 hex chars of md5(token)


@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tv AS (
      SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS v FROM tok
    ),
    bits AS (
      SELECT doc_id, j,
        SUM(CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM tv, UNNEST(range({SIMHASH_BITS})) AS u(j)
      GROUP BY doc_id, j
    )
    SELECT doc_id,
      CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash over distinct tokens: per-bit majority vote of token hashes,
    reassembled into a 32-bit signature. Near-dup docs differ in few bits.
    Pipeline: map-side explode (tokens × bits), one shuffle on (doc_id, j),
    one on doc_id — linear in corpus size."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token")).distinct()
    tv = tok.select(
        "doc_id", F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint").alias("v")
    )
    bits = (
        tv.select("doc_id", "v", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"))
        .groupBy("doc_id", "j")
        .agg(
            F.sum(
                F.when(F.expr("(v >> j) & 1") == 1, 1).otherwise(-1)
            ).alias("s")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(1L, j)")).otherwise(F.lit(0))).alias(
            "simhash"
        )
    )


# ------------------------------------------------------------ n-gram Jaccard

JACCARD_THRESHOLD = 0.5


@query(
    "neardup_ngram_jaccard",
    oracle="WITH"
    + _SHINGLES_SQL
    + ","
    + _minhash_sig_sql()
    + f""",
    bands AS (
      {_bands_sql()}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
      SELECT doc1, doc2, COUNT(*) AS c
      FROM cand
      JOIN sh a ON a.doc_id = doc1
      JOIN sh b ON b.doc_id = doc2 AND b.shingle = a.shingle
      GROUP BY doc1, doc2
    )
    SELECT doc1, doc2,
      CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) AS jaccard
    FROM common
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= {JACCARD_THRESHOLD}
    """,
)
def neardup_ngram_jaccard(spark, sf_dir):
    """The full near-dup pipeline: MinHash-LSH candidate pairs -> exact
    3-gram Jaccard verification -> threshold. This is the at-scale shape:
    the exact O(|pair| * shingles) verification only ever runs on LSH
    candidates, never all pairs. Shuffle keys: band bucket (candidates),
    then doc_id (verification joins)."""
    sh = shingles_cached(spark, sf_dir)
    cand = dedup_minhash_lsh_pairs(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc1"), F.col("shingle").alias("sha"))
    b = sh.select(F.col("doc_id").alias("doc2b"), F.col("shingle").alias("shb"))
    common = (
        cand.join(a, "doc1")
        .join(b, (F.col("doc2") == F.col("doc2b")) & (F.col("sha") == F.col("shb")))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("sz").alias("sz2"))
    jac = F.col("c").cast("double") / (F.col("sz1") + F.col("sz2") - F.col("c"))
    return (
        common.join(s1, "doc1")
        .join(s2, "doc2")
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
      SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS v FROM tok
    ),
    bits AS (
      SELECT doc_id, j,
        SUM(CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM tv, UNNEST(range({SIMHASH_BITS})) AS u(j)
      GROUP BY doc_id, j
    ),
    sig AS (
      SELECT doc_id,
        CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    )
"""

HAMMING_MAX = 3
_N_BLOCKS = 8  # 8 nibbles of 4 bits; d <= 3 < 8 blocks => >= 1 identical block (pigeonhole)


@query(
    "dedup_simhash_hamming_pairs",
    oracle=f"""
    WITH {_SIMHASH_SQL},
    blocks AS (
      SELECT doc_id, simhash, b, (simhash >> (4 * b)) & 15 AS nib
      FROM sig, UNNEST(range({_N_BLOCKS})) AS u(b)
    )
    SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
      CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM blocks a JOIN blocks b
      ON a.b = b.b AND a.nib = b.nib AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    """,
)
def dedup_simhash_hamming_pairs(spark, sf_dir):
    """Near-dup pairs with simhash hamming distance <= 3, found WITHOUT an
    all-pairs scan: split the 32-bit signature into 8 nibbles; by
    pigeonhole, any pair within distance 3 agrees on at least one nibble,
    so candidates come from an equi-join on (block, nibble) and only they
    get the exact bit_count check. Shuffle key = (block, nibble)."""
    sig = dedup_simhash(spark, sf_dir)
    blocks = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(_N_BLOCKS - 1))).alias("b"),
    ).withColumn("nib", F.expr("(simhash >> (4 * b)) & 15"))
    other = blocks.select(
        F.col("doc_id").alias("doc2"),
        F.col("simhash").alias("simhash2"),
        F.col("b").alias("b2"),
        F.col("nib").alias("nib2"),
    )
    ham = F.bit_count(F.col("simhash").bitwiseXOR(F.col("simhash2")))
    return (
        blocks.join(
            other,
            (F.col("b") == F.col("b2"))
            & (F.col("nib") == F.col("nib2"))
            & (F.col("doc_id") < F.col("doc2")),
        )
        .filter(ham <= HAMMING_MAX)
        .select(F.col("doc_id").alias("doc1"), "doc2", ham.cast("int").alias("hamming"))
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

"""Deduplication operators for a large-scale training-data pipeline.

All shapes are Spark-native and shuffle-aware:

* ``dedup_exact`` — one hash-aggregate on the fingerprint (map-side
  partial agg for free); at 100TB this is the canonical single-shuffle
  dedup.
* ``minhash_signatures`` / ``minhash_lsh_candidates`` — character-shingle
  MinHash entirely in JVM expressions (``transform``/``sequence``/
  ``array_min`` + seeded ``hash``), banded LSH via explode→self-join on
  (band, band_hash).  The self-join key space is the band hash, so the
  shuffle is proportional to candidate density, not n².
* ``ngram_jaccard_verify`` — exact n-gram Jaccard on candidate pairs only
  (array_intersect/array_union sizes), i.e. verify-after-probe.
* ``simhash64`` — 64-bit SimHash via a single ``aggregate`` over token
  hashes (bit-majority by zip_with accumulation), JVM-side.
* ``embedding_near_dup`` — cosine over an embedding column via
  ``zip_with`` + ``aggregate``; bucketed by sign-LSH to avoid n².
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dedup_exact",
    "char_shingles",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_verify",
    "simhash64",
    "cosine_sim",
    "embedding_near_dup",
    "winnow_fingerprints",
    "WINNOW_SQL_TEMPLATE",
]


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep the smallest id per identical (normalized) text.

    One shuffle on the md5 fingerprint; the fingerprint (16B) — not the
    full text — is the shuffle key+payload, which matters at 100TB.
    """
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")) if normalize else F.col(text_col)
    fp = F.md5(F.lower(norm)).alias("fp")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def char_shingles(col: Column, k: int = 5) -> Column:
    """Array of k-char shingles of the normalized text (JVM-side)."""
    n = F.trim(F.regexp_replace(col, r"\s+", " "))
    n = F.lower(n)
    return F.when(F.length(n) < k, F.array(n)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(n) - F.lit(k - 1)),
            lambda i: n.substr(i, F.lit(k)),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, sig: array<long>) — sig[i] = min over shingles of hash_i(shingle).

    Two-level hash family keeps the string work O(shingles), not
    O(shingles × perms): each *string* shingle is xxhash64'd exactly once
    into a long array, then the seeded family remixes the cheap longs
    (``xxhash64(h, seed)``).  Everything is whole-stage codegen; the
    distinct-shingle projection sits behind its own ``select`` so Catalyst
    cannot inline the expensive ``transform`` into every permutation
    (CollapseProject refuses to duplicate non-cheap expressions)."""
    hs = F.transform(
        F.array_distinct(char_shingles(F.col(text_col), shingle_k)),
        lambda s: F.xxhash64(s),
    ).alias("__hs")
    base = df.select(F.col(id_col).alias("id"), hs)
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__hs"), lambda h, i=i: F.xxhash64(h, F.lit(i))))
            for i in range(num_perm)
        ]
    ).alias("sig")
    return base.select("id", sig)


def minhash_lsh_candidates(
    sig_df: DataFrame, bands: int = 8, rows_per_band: Optional[int] = None
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs
    (id_a < id_b).  Shuffle key = (band, hash-of-band-rows)."""
    if rows_per_band is None:
        first = sig_df.select(F.size("sig").alias("n")).limit(1).collect()
        n = first[0]["n"] if first else 0
        rows_per_band = max(1, n // bands) if n else 4
    buckets = sig_df.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band).cast("string"))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.8,
    persist_shingles: bool = False,
) -> DataFrame:
    """Exact char-k-gram Jaccard on candidate pairs only (verify stage).

    Only documents that appear in a candidate pair are shingled: a
    broadcast semi-join on the (small) candidate id set prunes the corpus
    before the expensive shingle projection, so the verify stage is
    O(candidates) whatever the corpus size.  ``persist_shingles``
    additionally caches that pruned table so the id_a and id_b join sides
    share one computation."""
    ids_needed = (
        candidates.select(F.col("id_a").alias("id"))
        .unionByName(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = (
        df.select(F.col(id_col).alias("id"), F.col(text_col))
        .join(F.broadcast(ids_needed), "id", "left_semi")
        .select(
            "id",
            F.array_distinct(char_shingles(F.col(text_col), k)).alias("sh"),
        )
    )
    if persist_shingles:
        sh = sh.persist()
    j = (
        # candidate pairs are tiny vs the corpus — broadcast them so the
        # shingle table is scanned once per side with no shuffle.
        F.broadcast(candidates)
        .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return j.where(F.col("jaccard") >= threshold)


def simhash64(col: Column, bits: int = 64) -> Column:
    """64-bit SimHash of the whitespace tokens, JVM-side, single pass.

    Each token is xxhash64'd exactly once; one ``aggregate`` carries an
    ``array<long>`` of per-bit counters updated via ``zip_with`` +
    ``getbit(h, i)`` (bit position as a lambda variable — no per-bit
    unrolled aggregate passes).  The final signature is assembled from
    the two 32-bit halves to stay inside long range under ANSI mode.
    """
    toks = F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")
    hs = F.transform(toks, lambda t: F.xxhash64(t))
    seq = F.sequence(F.lit(0), F.lit(bits - 1))
    zero = F.transform(seq, lambda i: F.lit(0).cast("long"))
    counts = F.aggregate(
        hs,
        zero,
        lambda acc, h: F.zip_with(
            acc, seq, lambda a, i: a + F.getbit(h, i) * 2 - F.lit(1)
        ),
    )
    bits_arr = F.transform(
        counts, lambda c: F.when(c > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
    )
    half = bits // 2
    # MSB-first fold of each 32-bit half: acc*2+b never exceeds 2^32-1.
    lo = F.aggregate(
        F.reverse(F.slice(bits_arr, 1, half)),
        F.lit(0).cast("long"),
        lambda acc, b: acc * 2 + b,
    )
    hi = F.aggregate(
        F.reverse(F.slice(bits_arr, half + 1, half)),
        F.lit(0).cast("long"),
        lambda acc, b: acc * 2 + b,
    )
    # two's-complement recombine: (hi - 2^32 if hi >= 2^31) * 2^32 + lo
    hi_signed = F.when(hi >= F.lit(1 << 31), hi - F.lit(1 << 32)).otherwise(hi)
    return hi_signed * F.lit(1 << 32).cast("long") + lo


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, fully JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def embedding_near_dup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate vectors: sign-LSH bucket (n_planes pseudo-random
    hyperplanes derived from seeded per-dimension hashes) then exact
    cosine within buckets — avoids the n² cross join."""
    from .similarity import bucket_of

    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "bucket", bucket_of(F.col("v"), n_planes)
    )
    x = b.alias("x")
    y = b.alias("y")
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id")),
        )
        .withColumn("cos", cosine_sim(F.col("x.v"), F.col("y.v")))
        .where(F.col("cos") >= threshold)
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.round("cos", 6).alias("cos"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    base: int = 31,
    mod: int = 1_000_000_007,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): polynomial
    rolling hash of char k-grams, min-of-each-window selection, distinct.

    The hash is an ENGINE-NEUTRAL polynomial (Σ code·B^i mod M with all
    intermediates < 2^53), so an ANSI-SQL twin computes identical values
    — unlike xxhash/murmur families this fingerprint is portable, which
    is what makes cross-system dedup ledgers possible.  Entirely JVM
    expressions: one shuffle only if the caller aggregates.

    Returns (id, fp) exploded — one row per distinct selected fingerprint.
    """
    powers = [pow(base, k - 1 - j, mod) for j in range(k)]
    n = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    # texts shorter than one gram are right-padded (identically in the
    # SQL twin) so every gram has exactly k characters
    n = F.when(F.length(n) < k, F.rpad(n, k, " ")).otherwise(n)

    # char codes are materialized as a real column so every lambda below
    # references a bound column (evaluated once per row) — inlining the
    # split into each element_at would recompute it per gram element
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.split(n, ""), lambda ch: F.ascii(ch).cast("long")).alias(
            "__codes"
        ),
    )
    codes = F.col("__codes")

    def gram_hash(i: Column) -> Column:
        acc = F.lit(0).cast("long")
        for j, p in enumerate(powers):
            acc = acc + F.element_at(codes, i + j) * F.lit(p)
        return F.pmod(acc, F.lit(mod))

    hashed = base.select(
        "id",
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(codes) - F.lit(k - 1), F.lit(1))),
            gram_hash,
        ).alias("__hashes"),
    )
    hashes = F.col("__hashes")
    sel = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size(hashes) - F.lit(window - 1), F.lit(1)),
            ),
            lambda i: F.array_min(F.slice(hashes, i, window)),
        )
    )
    return hashed.select("id", F.explode(sel).alias("fp"))


WINNOW_SQL_TEMPLATE = """
SELECT id, unnest(fps) AS fp FROM (
  SELECT doc_id AS id,
         list_distinct([
           list_min(hs[i : i + {wm1}])
           for i in range(1, greatest(len(hs) - {wm1}, 1) + 1)
         ]) AS fps
  FROM (
    SELECT doc_id,
           [CAST(list_sum([CAST(ascii(g[j + 1 : j + 1]) AS BIGINT) * {{powers}}[j + 1]
                           for j in range(0, {k})]) AS BIGINT) % {mod}
            for g in grams] AS hs
    FROM (
      SELECT doc_id,
             [norm[i : i + {km1}]
              for i in range(1, greatest(length(norm) - {km1}, 1) + 1)] AS grams
      FROM (SELECT doc_id,
                   CASE WHEN length(n0) < {k} THEN rpad(n0, {k}, ' ') ELSE n0 END AS norm
            FROM (SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS n0
                  FROM documents))
    )
  )
)
"""

"""SimHash near-duplicate detection — the third dedup modality
(exact-hash and MinHash-LSH live in ``__spark_entry__``/``blocking``).

SimHash: 64-bit signature where bit b is the sign of the weighted sum
of token-hash bits; near-duplicate documents differ in few bits. The
signature is computed in ONE Arrow pandas UDF (numpy bit-twiddling per
batch); candidate pairing uses the pigeonhole principle — split the 64
bits into 4 bands of 16, two docs within Hamming distance 3 share at
least one exact band, so banding is an equi-join key (same shuffle
shape as MinHash-LSH; no quadratic comparison)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _token_hash64(tok: str) -> int:
    h = 0xCBF29CE484222325
    for b in tok.encode("utf-8", "surrogatepass"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@F.pandas_udf(T.LongType())
def simhash64_udf(text: pd.Series) -> pd.Series:
    out = []
    cache: "dict[str, int]" = {}
    for t in text.to_numpy(dtype=object):
        if t is None:
            out.append(None)
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in str(t).lower().split():
            h = cache.get(tok)
            if h is None:
                h = _token_hash64(tok)
                cache[tok] = h
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        sig = 0
        for i in range(64):
            if acc[i] > 0:
                sig |= 1 << i
        # to signed int64
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out, dtype="object")


def simhash_bands(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bands: int = 4) -> DataFrame:
    """(band_key, id, simhash) — equi-join-able band keys over the
    64-bit signature (16-bit slices)."""
    sig = simhash64_udf(F.col(text_col))
    d = df.select(F.col(id_col).alias("id"), sig.alias("simhash"))
    width = 64 // bands
    out = None
    for b in range(bands):
        band = F.pmod(F.shiftrightunsigned("simhash", b * width), F.lit(1 << width))
        kv = d.select(
            F.concat(F.lit(f"sh{b}:"), band.cast("string")).alias("band_key"), "id", "simhash"
        )
        out = kv if out is None else out.unionByName(kv)
    return out


def hamming64(a, b):
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def simhash_near_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate pairs by SimHash banding + Hamming verification:
    (id_l, id_r, hamming)."""
    banded = simhash_bands(df, text_col, id_col)
    l = banded.alias("l")
    r = banded.alias("r")
    pairs = (
        l.join(r, "band_key")
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_l"),
            F.col("r.id").alias("id_r"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_l", "id_r"])
    )
    return pairs

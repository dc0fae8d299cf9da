"""Perceptual image hashing + Hamming near-duplicate detection — the
LAION-style image-dup pass for a multimodal corpus that does not have
embeddings yet (VERDICT r8 item 1).

Two standard 64-bit perceptual hashes, implemented from their public
descriptions (pHash.org; the python ``ImageHash`` library's documented
recipes — re-derived here, no code shared):

* ``phash64`` — resize to 32x32 grayscale, 2-D DCT-II, keep the 8x8
  low-frequency block, bit k = coefficient > median(block). Robust to
  re-encode/resize/small edits; the workhorse for photographic dupes.
* ``dhash64`` — resize to 9x8 grayscale, bit = pixel brighter than its
  right neighbour (row-major gradient signs). Cheaper, sharper on
  crops/brightness shifts.

Scale shape: the hash is ONE mapInPandas Arrow stage over (id, payload)
— numpy-vectorized DCT via a precomputed cosine matrix, no Python loop
per pixel, no shuffle (map-only; parallelism = input splits). Near-dup
pairing reuses the SimHash tier's Hamming band-blocking
(``operators/dedup.py``): split the 64-bit hash into ``n_blocks``
chunks, bucket-join on (block, chunk) — pigeonhole guarantees recall
for hamming <= n_blocks - 1 — then verify exact Hamming JVM-side with
``bit_count(xor)``. Never all-pairs.

Codec seam: as in ``operators/multimodal.py``, decode defaults to a
deterministic STUB (media libraries are absent in this container, and
the oracle gates are defined in stub semantics); ``codec="pil"`` /
``"auto"`` switch to a real import-guarded Pillow decode. The hash
math downstream of the decoded grayscale grid is REAL either way.

Reference provenance: no analogue in idavkaev/kafka-streams-task (its
values are weather JSON); beyond-reference multimodal dedup mandate
(SURVEY.md north-star extensions).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import _codec_fn, _resolve_codec

from ..schemas import fan_out_scan

#: pHash geometry: DCT input grid and the low-frequency block edge
PHASH_GRID = 32
HASH_EDGE = 8

def _hash_schema(df: DataFrame, id_col: str) -> T.StructType:
    """Output schema of the hash stage: the caller's id column with its
    OWN name and type (string URL keys are as natural as long ids for a
    crawl corpus — review r9: hardcoding ``doc_id: long`` broke every
    non-default ``id_col``), plus the signed-int64 hash."""
    return T.StructType(
        [df.schema[id_col], T.StructField("ih", T.LongType())]
    )


def fake_decode_gray(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic FAKE grayscale decode (STUB) — the test seam.

    Cycles the payload bytes into a ``height x width`` float grid (so a
    payload of exactly ``width*height`` bytes maps one byte to one
    pixel — perturbing a byte perturbs one pixel, which is what lets
    planted near-duplicates have closed-form hashes). Real path:
    :func:`pil_decode_gray` behind ``codec="pil"``/``"auto"``.
    """
    n = width * height
    if not payload:
        return np.zeros((height, width), dtype=np.float64)
    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
    reps = -(-n // buf.shape[0])  # ceil
    return (
        np.tile(buf, reps)[:n].astype(np.float64).reshape(height, width)
    )


def pil_decode_gray(payload: bytes, width: int, height: int) -> np.ndarray:
    """REAL grayscale decode+resize via Pillow (import-guarded at the
    codec seam; see :func:`..multimodal._resolve_codec`)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((width, height))
    return np.asarray(img, dtype=np.float64)


def _dct_matrix(n: int) -> np.ndarray:
    """Unnormalized DCT-II basis matrix ``C`` with
    ``C[k, m] = 2 * cos(pi * k * (2m + 1) / (2n))`` — the scipy
    ``dct(type=2, norm=None)`` convention (scale is irrelevant under
    the median threshold). 2-D DCT of grid ``g`` = ``C @ g @ C.T``."""
    k = np.arange(n).reshape(-1, 1)
    m = np.arange(n).reshape(1, -1)
    return 2.0 * np.cos(np.pi * k * (2 * m + 1) / (2 * n))


#: precomputed once per process; ~32x32 doubles
_DCT32 = _dct_matrix(PHASH_GRID)


def _pack_bits(bits: np.ndarray) -> int:
    """Row-major MSB-first pack of 64 booleans into a SIGNED int64
    (two's complement — the value Spark's LongType and DuckDB's BIGINT
    carry; bit 63 set ⇒ negative)."""
    flat = np.asarray(bits, dtype=np.uint64).reshape(-1)
    if flat.shape[0] != 64:
        raise ValueError(f"expected 64 bits, got {flat.shape[0]}")
    v = np.uint64(0)
    for b in flat:
        v = (v << np.uint64(1)) | np.uint64(b)
    return int(np.int64(v))


def phash64_from_gray(grid: np.ndarray) -> int:
    """64-bit pHash of a ``PHASH_GRID x PHASH_GRID`` grayscale grid:
    2-D DCT-II, 8x8 low-frequency block, bit = coefficient > median of
    the block (the DC term participates in the median, matching the
    widely-used ImageHash recipe)."""
    if grid.shape != (PHASH_GRID, PHASH_GRID):
        raise ValueError(f"phash expects {PHASH_GRID}x{PHASH_GRID}, got {grid.shape}")
    coeffs = _DCT32 @ grid @ _DCT32.T
    low = coeffs[:HASH_EDGE, :HASH_EDGE]
    return _pack_bits(low > np.median(low))


def dhash64_from_gray(grid: np.ndarray) -> int:
    """64-bit dHash of a ``8 x 9`` (rows x cols) grayscale grid:
    bit(r, c) = grid[r, c+1] > grid[r, c] (horizontal gradient sign)."""
    if grid.shape != (HASH_EDGE, HASH_EDGE + 1):
        raise ValueError(f"dhash expects {HASH_EDGE}x{HASH_EDGE + 1}, got {grid.shape}")
    return _pack_bits(grid[:, 1:] > grid[:, :-1])


def _hash_one(payload: bytes, method: str, decode) -> int:
    if method == "phash":
        return phash64_from_gray(decode(payload, PHASH_GRID, PHASH_GRID))
    return dhash64_from_gray(decode(payload, HASH_EDGE + 1, HASH_EDGE))


def image_hash_table(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "phash",
    codec: str = "stub",
) -> DataFrame:
    """``(<id_col>, ih)`` — one signed-int64 perceptual hash per image
    payload, in ONE Arrow stage (mapInPandas: batch-level codec reuse,
    numpy-vectorized DCT; no shuffle — at 100 TB this is a map-only
    pass over the asset scan). ``method`` in ``('phash', 'dhash')``;
    ``codec`` as in :func:`..multimodal.decode_image_features`.

    NULL/empty payloads (failed fetches, left-join misses) produce NO
    hash row — they are not images. Hashing them would either kill the
    job under a real codec (``Image.open`` raises) or, under the stub,
    collapse every such row onto ONE hash value: a mass bucket that
    explodes spurious hamming-0 "pairs" downstream (review r9). Callers
    wanting the drop-out inventory anti-join the output against the
    input ids."""
    if method not in ("phash", "dhash"):
        raise ValueError(f"method must be 'phash' or 'dhash', got {method!r}")
    mode = _resolve_codec(codec, f"image_hash_table({method})")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _codec_fn(mode, pil_decode_gray, fake_decode_gray)
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "ih": pd.array(
                        [
                            _hash_one(b, method, decode)
                            for b in pdf[payload_col]
                        ],
                        dtype="int64",
                    ),
                }
            )

    pruned = df.select(id_col, payload_col).filter(
        F.col(payload_col).isNotNull() & (F.octet_length(payload_col) > 0)
    )
    # opt-r16: a single-split source would serialize the whole Arrow
    # decode+hash stage into one Python worker; fan the projected scan
    # out to the session's parallelism first (no-op on real multi-file
    # asset tables)
    return fan_out_scan(pruned).mapInPandas(batches, _hash_schema(df, id_col))


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "phash",
    codec: str = "stub",
    max_hamming: int = 6,
    n_blocks: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: hash (one Arrow stage),
    then the SimHash tier's Hamming band-blocking — pigeonhole-complete
    for ``hamming <= n_blocks - 1``, candidates bounded per (block,
    chunk) bucket, exact ``bit_count(xor)`` verification JVM-side.
    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``.

    Defaults (hamming <= 6 over 8 blocks of 8 bits) follow common
    pHash dedup practice — note 8-bit chunks collide at ~n^2/32 even on
    uniform hashes, so past ~10^5 images run exact dedup first and/or
    set ``max_bucket`` (candidate-volume note in
    :func:`.dedup.hamming_near_dup_pairs`)."""
    from .dedup import hamming_near_dup_pairs

    hashed = image_hash_table(df, id_col, payload_col, method, codec)
    return hamming_near_dup_pairs(
        hashed,
        id_col=id_col,
        hash_col="ih",
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        max_bucket=max_bucket,
    )


def image_hash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "phash",
    codec: str = "stub",
    n_blocks: int = 8,
) -> DataFrame:
    """The persistable perceptual-hash index: ``(doc_id, ih, blk,
    chunk)`` rows (hash once, block once — write partitioned by ``blk``
    so the incremental probe prunes at scan time). The image twin of
    ``dedup.minhash_band_table``: a 100 TB corpus is hashed ONCE, and
    every re-crawl dedups against the index instead of re-decoding the
    archive."""
    from .dedup import hamming_block_table

    hashed = image_hash_table(df, id_col, payload_col, method, codec)
    return hamming_block_table(hashed, id_col, "ih", n_blocks)


def image_near_dup_pairs_incremental(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    method: str = "phash",
    codec: str = "stub",
    max_hamming: int = 6,
    n_blocks: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup image pairs TOUCHING a new crawl shard, against a
    persisted :func:`image_hash_index` — only the shard's images are
    decoded/hashed; the index is bucket-pruned (semi-join on the
    shard's (blk, chunk) set); old–old pairs never materialize. All
    parameters (method, codec, n_blocks) must match the index build.
    Returns ``(id_a, id_b, hamming)``."""
    from .dedup import hamming_block_table, hamming_incremental_pairs

    # lazy localCheckpoint: the blocked shard feeds two branches (the
    # bucket probe and the members union), so without pinning it the
    # decode+hash Arrow stage would run twice per shard — the minhash
    # incremental tier's run-exactly-once lesson. LAZY so building the
    # plan stays job-free; the pin is shard-sized (n_blocks rows x ~24
    # bytes per image), never corpus-sized.
    new_blocked = hamming_block_table(
        image_hash_table(new_df, id_col, payload_col, method, codec),
        id_col,
        "ih",
        n_blocks,
    ).localCheckpoint(eager=False)
    return hamming_incremental_pairs(
        new_blocked,
        index,
        id_col=id_col,
        hash_col="ih",
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        max_bucket=max_bucket,
    )


def video_frame_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 4,
    method: str = "phash",
) -> DataFrame:
    """``(<id_col>, frame_idx, fh)`` — a perceptual hash per SAMPLED
    video frame, fused into ONE mapInPandas stage: frame extraction
    (the :func:`..multimodal.fake_frame_slices` STUB contract — a real
    pyav keyframe sampler plugs in at the same seam) and the REAL
    pHash/dHash math run in the same task, so frame BYTES never leave
    the executor — only 8-byte hashes do. At 100 TB of video that fusion
    is the difference between shuffling frames and shuffling
    fingerprints. NULL/empty payloads and empty frame slices emit
    nothing, as in :func:`image_hash_table`."""
    if method not in ("phash", "dhash"):
        raise ValueError(f"method must be 'phash' or 'dhash', got {method!r}")
    if every_n < 1:
        # fail at the driver: 0 would crash range() inside every task,
        # a negative value would silently sample nothing (review r9)
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    from .multimodal import fake_frame_slices

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("fh", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hs = [], [], []
            for vid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    continue
                for fi, fb in fake_frame_slices(payload, every_n):
                    if not fb:
                        continue
                    ids.append(vid)
                    idxs.append(fi)
                    hs.append(_hash_one(fb, method, fake_decode_gray))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "fh": pd.array(hs, dtype="int64"),
                }
            )

    # opt-r16: fan the projected scan out so the fused frame-sample+hash
    # Arrow stage is not serialized by a single-split source
    return fan_out_scan(df.select(id_col, payload_col)).mapInPandas(batches, schema)


def video_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    min_shared_frames: int = 3,
    every_n: int = 4,
    method: str = "phash",
    max_frame_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate VIDEO pairs: two videos pair when they share at
    least ``min_shared_frames`` distinct frame-hash values — the
    standard frame-fingerprint overlap recipe (re-encodes/trims share
    most keyframe hashes; unrelated footage shares none).

    Spark shape: one fused sample+hash Arrow stage
    (:func:`video_frame_hashes`), per-video distinct hash set, then an
    inverted index on the frame hash — the same group-membership
    explode as the Hamming tier, so candidates are bounded per frame-
    hash bucket and nothing goes all-pairs. ``max_frame_bucket`` drops
    ubiquitous frames (black/title cards appear in THOUSANDS of videos
    and carry no identity — the stop-frame analogue of stopwords);
    raise it only with a deliberate reason. Returns
    ``(id_a, id_b, n_shared_frames)`` with ``id_a < id_b``."""
    from .dedup import shared_token_pairs

    if min_shared_frames < 1:
        raise ValueError(
            f"min_shared_frames must be >= 1, got {min_shared_frames}"
        )
    fh = video_frame_hashes(df, id_col, payload_col, every_n, method)
    return shared_token_pairs(
        fh,
        id_col=id_col,
        token_col="fh",
        min_shared=min_shared_frames,
        max_bucket=max_frame_bucket,
    ).withColumnRenamed("n_shared", "n_shared_frames")

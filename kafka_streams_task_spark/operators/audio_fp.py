"""Audio fingerprinting + near-duplicate detection (r9) — the audio
cell of the multimodal×dedup matrix.

The fingerprint follows the Haitsma & Kalker recipe ("A Highly Robust
Audio Fingerprint System", ISMIR 2002 — implemented from the paper, no
code shared): overlapping Hann-windowed frames → power spectrum →
log-spaced band energies → one 32-bit SUB-FINGERPRINT per frame whose
bit (f, b) is the sign of the band-energy difference's time derivative,
``(E[f][b] − E[f][b+1]) − (E[f−1][b] − E[f−1][b+1]) > 0``. Matching is
EXACT sub-fingerprint equality (the paper's own lookup primitive):
re-encoded/trimmed copies share most sub-fingerprints, unrelated audio
shares none — so clip pairing drops into the shared inverted-index
tier (``dedup.shared_token_pairs``), bounded per token bucket, never
all-pairs. A single 64-bit whole-clip hash was evaluated and rejected:
sign bits near energy ties flip under one-sample edits, and Hamming
blocking over the resulting ~10-bit distances needs chunks too coarse
to bound candidates (the r9 design note).

Codec seam, as in ``operators/multimodal.py``: the waveform decode is
a deterministic STUB (soundfile/ffmpeg absent in this container) —
bytes cycle into samples — while everything downstream of the float
waveform (windowing, FFT, banding, sign logic) is the REAL DSP math,
verified against a direct-DFT recomputation in the tests. A real
decoder (``soundfile.read``) plugs in at the same seam when present.

Reference provenance: no analogue in idavkaev/kafka-streams-task;
beyond-reference multimodal training-data mandate (SURVEY.md
north-star extensions).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..schemas import fan_out_scan

#: Haitsma-Kalker geometry, scaled down: 33 log-spaced bands -> 32 bits
#: per sub-fingerprint; 256-sample Hann frames at 50% overlap
N_BANDS = 33
FRAME = 256
HOP = 128

#: stub decode length: every clip renders to this many fake samples
STUB_SAMPLES = 4096


def fake_decode_waveform(payload: bytes, n_samples: int = STUB_SAMPLES) -> np.ndarray:
    """Deterministic FAKE waveform decode (STUB) — the test seam: bytes
    cycle into ``n_samples`` floats in [-1, 1). One perturbed byte
    perturbs the samples it lands on, which is what gives planted
    near-duplicates closed-form sub-fingerprint overlap. Real path:
    :func:`soundfile_decode_waveform` behind ``codec="soundfile"``/"auto"."""
    if not payload:
        return np.zeros(n_samples, dtype=np.float64)
    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
    reps = -(-n_samples // buf.shape[0])  # ceil
    return (
        np.tile(buf, reps)[:n_samples].astype(np.float64) - 128.0
    ) / 128.0


def soundfile_available() -> bool:
    """True when the soundfile library can be imported (never raises)."""
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def soundfile_decode_waveform(payload: bytes, n_samples: int = 0) -> np.ndarray:
    """REAL waveform decode via soundfile (mono-mixed); available only
    where the library is installed — see :func:`soundfile_available`.
    ``n_samples`` is ignored (the real clip sets its own length)."""
    import io

    import soundfile as sf

    data, _sr = sf.read(io.BytesIO(payload), dtype="float64")
    return data.mean(axis=1) if data.ndim > 1 else data


def _resolve_audio_codec(codec: str) -> str:
    if codec not in ("stub", "soundfile", "auto"):
        raise ValueError(
            f"codec must be 'stub', 'soundfile' or 'auto', got {codec!r}"
        )
    if codec == "soundfile" and not soundfile_available():
        raise ImportError(
            "codec='soundfile' requested but soundfile is not installed"
        )
    return codec


def _audio_codec_fn(mode: str):
    """Task-side codec choice — same executor-probe rule as the image
    seam (:func:`..multimodal._codec_fn`)."""
    if mode == "soundfile":
        return soundfile_decode_waveform
    if mode == "auto" and soundfile_available():
        return soundfile_decode_waveform
    return fake_decode_waveform


def band_edges(n_bins: int) -> np.ndarray:
    """``N_BANDS + 1`` strictly-increasing log-spaced FFT-bin edges over
    ``[1, n_bins]`` (DC excluded); the tail is pulled under ``n_bins``
    so every band is non-empty on small spectra."""
    e = np.round(np.geomspace(1, n_bins, N_BANDS + 1)).astype(int)
    for i in range(1, e.shape[0]):
        e[i] = max(e[i], e[i - 1] + 1)
    return np.minimum(e, n_bins - N_BANDS + np.arange(N_BANDS + 1))


def audio_subfingerprints(wave: np.ndarray) -> list[int]:
    """The REAL fingerprint math: one 32-bit sub-fingerprint per
    overlapping frame (see module docstring). Short clips are
    zero-padded to the two-frame minimum; returns ``n_frames - 1``
    ints in ``[0, 2^32)``."""
    wave = np.asarray(wave, dtype=np.float64)
    n = wave.shape[0]
    if n < FRAME + HOP:
        wave = np.pad(wave, (0, FRAME + HOP - n))
        n = wave.shape[0]
    n_frames = 1 + (n - FRAME) // HOP
    idx = np.arange(FRAME)[None, :] + HOP * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(wave[idx] * np.hanning(FRAME), axis=1)) ** 2
    e = band_edges(spec.shape[1])
    energies = np.add.reduceat(spec[:, : e[-1]], e[:-1], axis=1)
    d = energies[:, :-1] - energies[:, 1:]  # (n_frames, 32) band diffs
    bits = (d[1:] - d[:-1]) > 0             # (n_frames - 1, 32)
    weights = (np.uint64(1) << np.arange(31, -1, -1, dtype=np.uint64))
    return (bits.astype(np.uint64) @ weights).astype(np.int64).tolist()


AUDIO_FP_FIELDS = [
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("sfp", T.LongType()),
]


def audio_subfingerprint_table(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "stub",
) -> DataFrame:
    """``(<id_col>, frame_idx, sfp)`` — sub-fingerprints per audio
    payload in ONE mapInPandas stage (decode + window + FFT + banding
    fused in-task: waveforms never leave the executor, only 32-bit
    tokens do). NULL/empty payloads emit nothing (they are not audio —
    the image-tier convention)."""
    mode = _resolve_audio_codec(codec)
    schema = T.StructType([df.schema[id_col]] + AUDIO_FP_FIELDS)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _audio_codec_fn(mode)
        for pdf in it:
            ids, idxs, fps = [], [], []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    continue
                for i, s in enumerate(
                    audio_subfingerprints(decode(bytes(payload)))
                ):
                    ids.append(aid)
                    idxs.append(i)
                    fps.append(s)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "sfp": pd.array(fps, dtype="int64"),
                }
            )

    # opt-r16: fan the projected scan out so the fused decode+FFT+band
    # Arrow stage is not serialized by a single-split source
    return fan_out_scan(df.select(id_col, payload_col)).mapInPandas(batches, schema)


def audio_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    min_shared: int = 3,
    codec: str = "stub",
    max_token_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate AUDIO pairs: clips sharing at least ``min_shared``
    distinct sub-fingerprint values — exact-token matching through the
    shared inverted-index tier (``dedup.shared_token_pairs``), so
    candidates stay bounded per token bucket. ``max_token_bucket``
    drops ubiquitous tokens (silence frames are the audio stop-token).
    Returns ``(id_a, id_b, n_shared)`` with ``id_a < id_b``."""
    from .dedup import shared_token_pairs

    fps = audio_subfingerprint_table(df, id_col, payload_col, codec)
    return shared_token_pairs(
        fps,
        id_col=id_col,
        token_col="sfp",
        min_shared=min_shared,
        max_bucket=max_token_bucket,
    )

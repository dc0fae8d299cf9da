"""Audio fingerprinting (operators/audio_fp.py, r9): the Haitsma-Kalker
sub-fingerprint math verified against a direct-DFT recomputation,
planted near-dup overlap, the shared inverted-index pairing, codec
seam, and plan pins."""

from __future__ import annotations

import math

import numpy as np
import pytest

from kafka_streams_task_spark.operators.audio_fp import (
    FRAME,
    HOP,
    N_BANDS,
    audio_near_dup_pairs,
    audio_subfingerprint_table,
    audio_subfingerprints,
    band_edges,
    fake_decode_waveform,
)


def _mk(mul, add, mod, n=2048):
    return bytes((i * mul + add) % mod for i in range(n))


def _perturb(p, pos, delta):
    b = bytearray(p)
    b[pos] = (b[pos] + delta) % 256
    return bytes(b)


def _variants():
    a, b = _mk(37, 11, 251), _mk(53, 7, 241)
    return {
        0: a,
        1: _perturb(a, 500, 60),     # near-dup of 0
        2: _perturb(a, 1200, 90),    # near-dup of 0 and 1
        3: b,
        4: _perturb(b, 100, 70),     # near-dup of 3
        5: _mk(97, 3, 253),           # unrelated
    }


class TestPureMath:
    def test_subfingerprint_matches_direct_dft(self):
        """Re-derive ONE sub-fingerprint with a from-scratch direct DFT
        (no np.fft, no shared code path for the spectrum): frame 3's
        32 bits must match."""
        wave = fake_decode_waveform(_mk(37, 11, 251))
        got = audio_subfingerprints(wave)

        def direct_energies(f):
            start = HOP * f
            seg = [
                wave[start + i] * (0.5 - 0.5 * math.cos(2 * math.pi * i / (FRAME - 1)))
                for i in range(FRAME)
            ]
            nb = FRAME // 2 + 1
            spec = []
            for k in range(nb):
                re = sum(seg[i] * math.cos(-2 * math.pi * k * i / FRAME) for i in range(FRAME))
                im = sum(seg[i] * math.sin(-2 * math.pi * k * i / FRAME) for i in range(FRAME))
                spec.append(re * re + im * im)
            e = band_edges(nb)
            return [sum(spec[e[b]:e[b + 1]]) for b in range(N_BANDS)]

        e3, e4 = direct_energies(3), direct_energies(4)
        bits = [
            1 if (e4[b] - e4[b + 1]) - (e3[b] - e3[b + 1]) > 0 else 0
            for b in range(N_BANDS - 1)
        ]
        v = 0
        for bit in bits:
            v = (v << 1) | bit
        assert got[3] == v  # sub-fp index k covers frames (k, k+1)

    def test_hann_window_convention_matches_numpy(self):
        # the direct-DFT check above hand-builds np.hanning's cosine
        # form — pin the equivalence so the test can't drift from the
        # implementation silently
        i = np.arange(FRAME)
        hand = 0.5 - 0.5 * np.cos(2 * np.pi * i / (FRAME - 1))
        assert np.allclose(hand, np.hanning(FRAME))

    def test_near_dup_overlap_structure(self):
        sets = {
            m: set(audio_subfingerprints(fake_decode_waveform(p)))
            for m, p in _variants().items()
        }
        for a, b in [(0, 1), (0, 2), (1, 2), (3, 4)]:
            assert len(sets[a] & sets[b]) >= 3, (a, b)
        for a in (0, 1, 2):
            for b in (3, 4, 5):
                assert len(sets[a] & sets[b]) == 0, (a, b)

    def test_short_and_empty_clips(self):
        assert audio_subfingerprints(np.zeros(10)) == [0] * (
            len(audio_subfingerprints(np.zeros(10)))
        )
        # padding makes even tiny input well-defined
        assert len(audio_subfingerprints(np.arange(5, dtype=float))) >= 1

    def test_band_edges_strictly_increasing(self):
        for nb in (FRAME // 2 + 1, 64, N_BANDS + 1):
            e = band_edges(nb)
            assert e.shape[0] == N_BANDS + 1
            assert (np.diff(e) >= 1).all()
            assert e[-1] <= nb


class TestSparkOperators:
    def _df(self, spark, extra=()):
        rows = list(_variants().items()) + list(extra)
        return spark.createDataFrame(rows, "doc_id bigint, payload binary")

    def test_table_matches_pure_and_drops_null_empty(self, spark):
        df = self._df(spark, extra=[(9, None), (10, bytearray(b""))])
        got = {}
        for r in audio_subfingerprint_table(df).collect():
            got.setdefault(r["doc_id"], set()).add(r["sfp"])
        assert set(got) == set(range(6))
        for m, p in _variants().items():
            assert got[m] == set(
                audio_subfingerprints(fake_decode_waveform(p))
            ), m

    def test_pairs_match_brute_force(self, spark):
        sets = {
            m: set(audio_subfingerprints(fake_decode_waveform(p)))
            for m, p in _variants().items()
        }
        brute = {
            (a, b, len(sets[a] & sets[b]))
            for a in sets
            for b in sets
            if a < b and len(sets[a] & sets[b]) >= 3
        }
        got = {
            (r.id_a, r.id_b, r.n_shared)
            for r in audio_near_dup_pairs(
                self._df(spark), min_shared=3
            ).collect()
        }
        assert got == brute and len(got) == 4

    def test_plan_one_arrow_stage_no_cartesian(self, spark):
        plan = (
            audio_near_dup_pairs(self._df(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("MapInPandas") == 1
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                    "BatchEvalPython"):
            assert bad not in plan, bad

    def test_guards_and_codec_seam(self, spark):
        from kafka_streams_task_spark.operators.audio_fp import (
            soundfile_available,
        )

        df = self._df(spark)
        with pytest.raises(ValueError, match="codec"):
            audio_subfingerprint_table(df, codec="mp3")
        with pytest.raises(ValueError, match="min_shared"):
            audio_near_dup_pairs(df, min_shared=0)
        if not soundfile_available():
            with pytest.raises(ImportError, match="soundfile"):
                audio_subfingerprint_table(df, codec="soundfile")
            stub = {(r.doc_id, r.sfp) for r in
                    audio_subfingerprint_table(df, codec="stub").collect()}
            auto = {(r.doc_id, r.sfp) for r in
                    audio_subfingerprint_table(df, codec="auto").collect()}
            assert stub == auto

    def test_string_id_col(self, spark):
        rows = [(f"clip/{m}", p) for m, p in _variants().items()]
        df = spark.createDataFrame(rows, "clip_id string, payload binary")
        pairs = audio_near_dup_pairs(df, id_col="clip_id", min_shared=3)
        assert ("clip/0", "clip/1") in {
            (r.id_a, r.id_b) for r in pairs.collect()
        }

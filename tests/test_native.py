"""Unit tests for the native host kernels (SA-IS, banded SW, striped SW, NW)."""

import numpy as np
import pytest

from bwamem2_tpu.native import sais, bsw_extend, ksw_align, ksw_global
from bwamem2_tpu.options import fill_scmat

MAT = np.array(fill_scmat(1, 4), dtype=np.int8)


def brute_suffix_array(s: np.ndarray) -> list[int]:
    return sorted(range(len(s)), key=lambda i: bytes(s[i:]))


@pytest.mark.parametrize("seed", range(8))
def test_sais_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    for _ in range(6):
        n = int(rng.integers(1, 400))
        k = int(rng.integers(1, 5))
        s = rng.integers(0, k, n).astype(np.uint8)
        assert list(sais(s, 4)) == brute_suffix_array(s)


def test_sais_periodic_and_edge():
    for s in ([0], [0, 0, 0, 0], [3, 2, 1, 0], [0, 1, 0, 1, 0, 1],
              [1, 1, 0, 1, 1, 0, 1, 1, 0]):
        a = np.array(s, dtype=np.uint8)
        assert list(sais(a, 4)) == brute_suffix_array(a)


def test_bsw_extend_perfect_match():
    q = np.tile(np.array([0, 1, 2, 3], np.uint8), 10)
    t = np.tile(np.array([0, 1, 2, 3], np.uint8), 12)
    score, qle, tle, gtle, gscore, max_off = bsw_extend(
        q, t, MAT, 6, 1, 6, 1, 100, 5, 100, 30)
    assert score == 30 + 40
    assert (qle, tle) == (40, 40)
    assert gscore == 70 and gtle == 40
    assert max_off == 0


def test_bsw_extend_mismatch_and_zdrop():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 4, 60).astype(np.uint8)
    t = q.copy()
    t[30] = (t[30] + 1) % 4  # one mismatch
    score, qle, tle, gtle, gscore, _ = bsw_extend(
        q, t, MAT, 6, 1, 6, 1, 100, 5, 100, 20)
    assert score == 20 + 60 - 5  # -4 mismatch -1 lost match
    assert gscore == score


def test_bsw_extend_gap():
    rng = np.random.default_rng(2)
    q = rng.integers(0, 4, 50).astype(np.uint8)
    t = np.concatenate([q[:25], np.array([1, 1], np.uint8) * 0, q[25:]])
    t[25:27] = [(q[25] + 1) % 4, (q[26] + 2) % 4]
    score = bsw_extend(q, t, MAT, 6, 1, 6, 1, 100, 5, 100, 25)[0]
    assert score > 25  # extension gains despite the 2bp insertion in ref


def test_ksw_align_basic():
    q = np.tile(np.array([0, 1, 2, 3], np.uint8), 10)
    t = np.tile(np.array([0, 1, 2, 3], np.uint8), 12)
    score, te, qe, score2, te2, tb, qb = ksw_align(
        q, t, MAT, 6, 1, 6, 1, 0x80000 | 0x40000 | 19)
    assert score == 40
    assert qe - qb + 1 == 40 and te - tb + 1 == 40


def test_ksw_align_u8_matches_i16():
    rng = np.random.default_rng(3)
    for _ in range(10):
        q = rng.integers(0, 4, 40).astype(np.uint8)
        t = rng.integers(0, 4, 120).astype(np.uint8)
        t[40:80] = q  # plant a hit
        r8 = ksw_align(q, t, MAT, 6, 1, 6, 1, 0x10000 | 0x80000 | 0x40000 | 19)
        r16 = ksw_align(q, t, MAT, 6, 1, 6, 1, 0x80000 | 0x40000 | 19)
        assert r8[0] == r16[0]  # same best score
        assert r8[1:3] == r16[1:3]  # same end positions


def test_ksw_global_cigar():
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    t = np.array([0, 1, 2, 0, 1, 2, 3], np.uint8)  # one base missing
    score, cig = ksw_global(q, t, MAT, 6, 1, 6, 1, 5)
    ops = [(int(c) >> 4, "MID"[c & 0xF]) for c in cig]
    assert sum(l for l, op in ops if op in "MI") == len(q)
    assert sum(l for l, op in ops if op in "MD") == len(t)
    assert any(op == "I" for _, op in ops)


def test_chain_seeds_batch_native_parity():
    """C++ chain_seeds_batch == python chain_seeds, field for field."""
    import numpy as np
    from bwamem2_tpu.align import chain as chain_mod
    from bwamem2_tpu.align.seeding import collect_smems, encode_reads
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader, read_chunk
    from bwamem2_tpu.options import MemOptions
    from conftest import DATA, FIXTURES
    import os

    fm = FMIndex.load(os.path.join(FIXTURES, "ref_small.fa"))
    opt = MemOptions().finalize()
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_se.fq")),
                       None, 10**9)[:120]
    encs = encode_reads([r.seq for r in reads])
    smems = collect_smems(fm, encs, opt)
    (allpos, smem_off, smem_m, smem_n, smem_s,
     occ_off) = chain_mod.sa_positions_batch(opt, smems)
    coords = np.array([fm.get_sa_entry(int(p)) for p in allpos], np.int64)
    got = chain_mod.chain_seeds_batch_native(
        fm, opt, encs, smem_off, smem_m, smem_n, smem_s, occ_off, coords)
    for seqid, (enc, sm) in enumerate(zip(encs, smems)):
        want = chain_mod.chain_seeds(fm, opt, seqid, len(enc), sm,
                                     coords=None)
        g = got[seqid]
        assert len(g) == len(want), seqid
        for cg, cw in zip(g, want):
            assert (cg.pos, cg.rid, cg.seqid, cg.is_alt) == \
                (cw.pos, cw.rid, cw.seqid, cw.is_alt)
            assert cg.frac_rep == cw.frac_rep
            assert [(s.rbeg, s.qbeg, s.len, s.score) for s in cg.seeds] == \
                [(s.rbeg, s.qbeg, s.len, s.score) for s in cw.seeds]


def test_fastq_reader_http_and_gz_inputs():
    """kopen parity: http:// and gzip inputs stream through FastxReader."""
    import gzip
    import http.server
    import threading
    import os

    from bwamem2_tpu.io.fastq import FastxReader
    from conftest import DATA

    src = os.path.join(DATA, "reads_se.fq")
    with open(src, "rb") as f:
        raw = f.read()
    tmpdir = os.path.join(os.path.dirname(DATA), "tmp")
    os.makedirs(tmpdir, exist_ok=True)
    gzpath = os.path.join(tmpdir, "reads_se.fq.gz")
    with gzip.open(gzpath, "wb") as f:
        f.write(raw)

    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(
        *a, directory=DATA, **k)
    httpd = http.server.HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/reads_se.fq"
        want = []
        r = FastxReader(src)
        while (rd := r.read_one()) is not None:
            want.append((rd.name, rd.seq, rd.qual))

        for path in (url, gzpath):
            got = []
            r = FastxReader(path)
            while (rd := r.read_one()) is not None:
                got.append((rd.name, rd.seq, rd.qual))
            assert got == want, path
    finally:
        httpd.shutdown()


def test_chain_and_filter_batch_native_parity():
    """C++ chain+filter == python chain_seeds -> chain_filter, including
    the ks_introsort tie permutation and kept/first cap logic."""
    import numpy as np
    from bwamem2_tpu.align import chain as chain_mod
    from bwamem2_tpu.align.seeding import collect_smems, encode_reads
    from bwamem2_tpu.index.fmindex import FMIndex
    from bwamem2_tpu.io.fastq import FastxReader, read_chunk
    from bwamem2_tpu.options import MemOptions
    from conftest import DATA, FIXTURES
    import os

    fm = FMIndex.load(os.path.join(FIXTURES, "ref_small.fa"))
    opt = MemOptions().finalize()
    reads = read_chunk(FastxReader(os.path.join(DATA, "reads_se.fq")),
                       None, 10**9)[:150]
    encs = encode_reads([r.seq for r in reads])
    smems = collect_smems(fm, encs, opt)
    (allpos, smem_off, smem_m, smem_n, smem_s,
     occ_off) = chain_mod.sa_positions_batch(opt, smems)
    coords = np.array([fm.get_sa_entry(int(p)) for p in allpos], np.int64)
    got = chain_mod.chain_and_filter_batch_native(
        fm, opt, encs, smem_off, smem_m, smem_n, smem_s, occ_off, coords)
    for seqid, (enc, sm) in enumerate(zip(encs, smems)):
        want = chain_mod.chain_filter(
            opt, chain_mod.chain_seeds(fm, opt, seqid, len(enc), sm,
                                       coords=None))
        g = got[seqid]
        assert len(g) == len(want), seqid
        for cg, cw in zip(g, want):
            assert (cg.pos, cg.rid, cg.is_alt, cg.w, cg.kept) == \
                (cw.pos, cw.rid, cw.is_alt, cw.w, cw.kept)
            assert [(s.rbeg, s.qbeg, s.len) for s in cg.seeds] == \
                [(s.rbeg, s.qbeg, s.len) for s in cw.seeds]

"""Index build parity: our builder's output must be byte-identical to the
reference bwa-mem2 binary's index (fixtures committed in tests/fixtures/)."""

import filecmp
import os

import numpy as np
import pytest

from bwamem2_tpu.index.build import build_index
from bwamem2_tpu.index.fmindex import FMIndex
from bwamem2_tpu.index import io as idxio

from conftest import DATA, FIXTURES


@pytest.fixture(scope="module")
def built_prefix(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("idx")
    prefix = str(tmp / "ref_small.fa")
    import shutil
    shutil.copy(os.path.join(DATA, "ref_small.fa"), prefix)
    build_index(prefix, verbose=False)
    return prefix


@pytest.mark.parametrize("suffix", [".pac", ".ann", ".amb", ".0123",
                                    ".bwt.2bit.64"])
def test_index_files_byte_identical(built_prefix, suffix):
    ours = built_prefix + suffix
    golden = os.path.join(FIXTURES, "ref_small.fa" + suffix)
    assert os.path.getsize(ours) == os.path.getsize(golden), suffix
    assert filecmp.cmp(ours, golden, shallow=False), f"{suffix} differs"


def test_load_roundtrip(built_prefix):
    fm = FMIndex.load(built_prefix)
    assert fm.l_pac == 100000
    assert fm.ref_seq_len == 2 * 100000 + 1
    assert fm.bns.n_seqs == 2
    assert fm.bns.anns[0].name == "chrA"
    assert fm.bns.anns[1].anno == "test contig"
    # counts are cumulative with the +1 sentinel shift
    assert fm.counts[0] == 1
    assert fm.counts[4] == fm.ref_seq_len
    # ref_string is the doubled genome; check reverse-complement structure
    assert len(fm.ref_string) == 2 * fm.l_pac
    np.testing.assert_array_equal(
        fm.ref_string[fm.l_pac:], (3 - fm.ref_string[:fm.l_pac][::-1]))


def test_sa_entries_resolve(built_prefix):
    """Every BWT position must LF-walk to the correct suffix position."""
    fm = FMIndex.load(built_prefix)
    # reconstruct the true SA on the doubled genome for spot checks
    from bwamem2_tpu.native import sais
    seq = fm.ref_string
    sa_body = sais(seq, 4)
    sa = np.concatenate([[len(seq)], sa_body])
    rng = np.random.default_rng(0)
    for pos in rng.integers(0, fm.ref_seq_len, 200):
        assert fm.get_sa_entry(int(pos)) == sa[int(pos)]


def test_backward_ext_matches_bruteforce(built_prefix):
    """backward_ext must agree with a brute-force count over the doubled
    genome + sentinel suffix ordering."""
    fm = FMIndex.load(built_prefix)
    seq = fm.ref_string
    n = len(seq)
    rng = np.random.default_rng(1)
    # pick random patterns that occur, extend backwards one char
    for _ in range(40):
        ln = int(rng.integers(1, 20))
        start = int(rng.integers(0, n - ln))
        pat = seq[start:start + ln]
        # interval of pat via backward search from scratch
        a = int(pat[-1])
        k, l, s = int(fm.counts[a]), int(fm.counts[3 - a]), \
            int(fm.counts[a + 1] - fm.counts[a])
        ok = True
        for c in pat[-2::-1]:
            k, l, s = fm.backward_ext(k, l, s, int(c))
            if s == 0:
                ok = False
                break
        assert ok, "pattern from the genome must be found"
        # brute-force occurrence count
        cnt = 0
        patb = pat.tobytes()
        sb = seq.tobytes()
        p = sb.find(patb)
        while p != -1:
            cnt += 1
            p = sb.find(patb, p + 1)
        assert s == cnt, (ln, start)

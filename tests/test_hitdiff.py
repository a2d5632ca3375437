'''
Hit-LEVEL differential gate vs the reference hot-loop reimplementation
(tools/ref_bench.c): the full ``(seq_nr, file_pos, seq_pos, length,
readlength)`` stream of ``engine.findseqs`` must be byte-identical to
the C scanner's -- not just the total count (reference
workhorse.c:1107-1174; tests/test_engine.py covers counts, this covers
the streams so compensating errors cannot hide).
'''

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
import hitdiff  # noqa: E402

FASTQS = os.path.join(os.path.dirname(__file__), 'fastqs')


@pytest.fixture(scope='module')
def ref_bin(tmp_path_factory):
    out = tmp_path_factory.mktemp('refbench')
    binpath = hitdiff.build_ref_bench(str(out))
    if binpath is None:
        pytest.skip('no C compiler available')
    return binpath


def _revcomp(s):
    comp = dict(zip('ACGT', 'TGCA'))
    return ''.join(comp.get(c, c) for c in reversed(s))


def test_fixture_hit_streams(ref_bin, tmp_path):
    ''' engine fixture x maxerrors 0-3 x minoverlap sweep '''
    fixture = os.path.join(FASTQS, 'test_engine.fastq')
    plus = ['CACCGGTGTAGGCAAGTCGTAACAAGG', 'TTTTTTTTTTGGGGGGGGGG',
            'CCCC', 'CCC']
    seqs = plus + [_revcomp(s) for s in plus]
    total = 0
    for e in range(4):
        for mo in (3, 10, 20):
            total += hitdiff.run_case(ref_bin, fixture, seqs, 33 + 2, e,
                                      mo, 3, str(tmp_path))
    assert total > 0


def test_randomized_hit_streams(ref_bin, tmp_path):
    ''' randomized corpora engineered to exercise all 4 overlap modes,
        including N bases and trim-window tie cases '''
    rng = np.random.RandomState(42)
    total = 0
    for c in range(2):
        seqs = hitdiff.random_templates(rng, 10)
        corpus = str(tmp_path / ('corpus%d.fastq' % c))
        hitdiff.random_corpus(corpus, seqs, 300, seed=500 + c,
                              with_n=(c == 1))
        for e in (0, 2, 3):
            for mo in (10, 25):
                total += hitdiff.run_case(ref_bin, corpus, seqs, 33 + 10,
                                          e, mo, 10, str(tmp_path))
    assert total > 0


def test_golden_5k_hit_stream(ref_bin, tmp_path):
    ''' the golden 5k MTBC extract against the full real template bank '''
    gold = os.path.join(FASTQS, 'L3_N1014_hits_5k.fastq')
    mtbc = os.path.join(os.path.dirname(__file__), '..', 'testsuites',
                        'MTBC', 'MTB_ancestor_reference.bases')
    if not os.path.exists(mtbc):
        pytest.skip('run tools/reconstruct_genome.py first')
    from kvarq_tpu.analyse import Analyser
    from kvarq_tpu.testsuites import discover_testsuites, load_testsuites
    from kvarq_tpu.log import set_warning
    set_warning()
    suites = load_testsuites(
        discover_testsuites([os.path.join(os.path.dirname(__file__), '..',
                                          'testsuites')]), ['MTBC'])
    covs = Analyser().load_coverages(suites, spacing=25)
    seqs = [c.plus_seq.bases for c in covs.values()] \
        + [c.minus_seq.bases for c in covs.values()]
    n = hitdiff.run_case(ref_bin, gold, seqs, 33 + 13, 2, 25, 25,
                         str(tmp_path))
    assert n == 1704  # both scanners agree on this exact stream

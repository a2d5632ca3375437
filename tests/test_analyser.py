'''
Analyser integration tests (ported from reference tests/test_analyser.py):
encode/decode round trip, golden results on the crafted fixture,
Coverage.apply_hit micro-scenarios.
'''

import os.path

import numpy as np

import pytest

from kvarq_tpu import engine
from kvarq_tpu import genes
from kvarq_tpu import analyse
from kvarq_tpu.fastq import Fastq
from kvarq_tpu.analyse import Coverage
from kvarq_tpu.engine import Hit

HERE = os.path.abspath(os.path.dirname(__file__))
MTBC = os.path.join(HERE, os.path.pardir, 'testsuites', 'MTBC')
FNAME = os.path.join(HERE, 'fastqs', 'test_analyser.fastq')


@pytest.fixture(scope='module')
def suites():
    if not os.path.exists(os.path.join(MTBC,
                                       'MTB_ancestor_reference.bases')):
        pytest.skip('run tools/reconstruct_genome.py first')
    from kvarq_tpu.log import set_warning
    set_warning()
    return {
        'phylo': genes.load_testsuite(os.path.join(MTBC, 'phylo.py')),
        'spoligo': genes.load_testsuite(os.path.join(MTBC, 'spoligo.py')),
    }


def test_encoding(suites):
    ''' encode -> decode round trip preserves results '''
    engine.config(nthreads=1, minoverlap=10, minreadlength=10,
                  maxerrors=0, Amin='!')

    analyser = analyse.Analyser()
    analyser.scan(Fastq(FNAME, quiet=True), {'phylo': suites['phylo']})
    analyser.update_coverages()
    analyser.update_testsuites()
    results1 = analyser.results
    data = analyser.encode(hits=True)

    analyser = analyse.Analyser()
    analyser.decode({'phylo': suites['phylo']}, data)
    analyser.update_coverages()
    analyser.update_testsuites()
    results2 = analyser.results

    assert results1 == results2


def test_json_roundtrip_via_file(suites, tmp_path):
    ''' encode -> json file -> decode also round trips (serialized form) '''
    import json
    from kvarq_tpu.util import json_dump

    engine.config(nthreads=1, minoverlap=10, minreadlength=10,
                  maxerrors=0, Amin='!')
    analyser = analyse.Analyser()
    analyser.scan(Fastq(FNAME, quiet=True), {'phylo': suites['phylo']})
    analyser.update_testsuites()
    data = analyser.encode(hits=True)

    p = tmp_path / 'out.json'
    with open(p, 'w') as f:
        json_dump(data, f)
    data2 = json.load(open(p))

    analyser2 = analyse.Analyser()
    analyser2.decode({'phylo': suites['phylo']}, data2)
    analyser2.update_testsuites()
    assert analyser2.results == analyser.results
    assert [list(c) for c in data2['coverages']] == \
        [list(c) for c in analyser.encode()['coverages']]


def test_genes(suites):
    ''' golden: crafted fixture produces the documented spoligo code and
        beijing lineage (reference tests/test_analyser.py:53-66) '''
    engine.config(nthreads=1, minoverlap=10, maxerrors=1,
                  minreadlength=10, Amin='!')

    analyser = analyse.Analyser()
    analyser.scan(Fastq(FNAME, quiet=True), suites)
    analyser.update_coverages()
    analyser.update_testsuites()

    assert analyser.results['spoligo'].split(' ')[0] == '400000000000001'
    assert analyser.results['phylo'].startswith(
        'lineage 2/beijing sublineage')


def test_no_reverse(suites, tmp_path):
    ''' -1/--no-reverse: only the plus strand is scanned, so a read that
        is the reverse complement of a template stops hitting '''
    from kvarq_tpu.analyse import Analyser

    engine.config(nthreads=1, minoverlap=10, maxerrors=0,
                  minreadlength=10, Amin='!')

    # reverse-complement of the spoligo43 spacer (numbered 42)
    spacer = [t for t in suites['spoligo'].tests
              if t.genotype.identifier == 'spoligo42'][0]
    rc = genes.Sequence(spacer.template.bases).reverse().bases
    fname = tmp_path / 'rc.fastq'
    fname.write_text('@r0\n%s\n+\n%s\n' % (rc, 'I' * len(rc)))

    full = Analyser()
    full.scan(Fastq(str(fname), variant='Sanger', quiet=True), suites,
              do_reverse=True)
    fwd = Analyser()
    fwd.scan(Fastq(str(fname), variant='Sanger', quiet=True), suites,
             do_reverse=False)

    assert list(fwd.coverages.keys()) == list(full.coverages.keys())
    name = str(spacer.template)
    assert np.asarray(full.coverages[name].coverage).sum() > 0
    assert np.asarray(fwd.coverages[name].coverage).sum() == 0


def test_coverage():
    #   AACCGGTT    : template
    #   ATCCGGTTTT  : hit1
    # AAAACCGGTT    : hit2
    #  AATCCGGTTA   : hit3
    seq = genes.Sequence('AACCGGTT')
    cov = Coverage(seq)

    cov.apply_hit(
        Hit(seq_nr=0, file_pos=-1, seq_pos=0, length=8, readlength=10),
        'ATCCGGTTTT', on_plus_strand=True)
    assert cov.minf() == 1
    assert not cov.mixed()
    assert tuple(cov.coverage) == tuple([1] * 8)
    assert 1 in cov.mutations
    cov.deserialize(cov.serialize())
    assert tuple(cov.coverage) == tuple([1] * 8)
    assert 1 in cov.mutations

    cov.apply_hit(
        Hit(seq_nr=0, file_pos=-1, seq_pos=-2, length=8, readlength=10),
        'AACCGGTT', on_plus_strand=True)
    cov.apply_hit(
        Hit(seq_nr=0, file_pos=-1, seq_pos=-1, length=8, readlength=10),
        'ATCCGGTTA', on_plus_strand=True)

    assert cov.minf() > 0.65 and cov.minf() < 0.69
    assert cov.mixed()
    fs = cov.fractions_at(1)
    keys = list(fs.keys())
    vals = list(fs.values())
    assert keys[0] == 'T' and vals[0] > 0.65
    assert keys[1] == 'A' and vals[1] < 0.35


def test_coverage_minus_strand():
    ''' hits on the minus strand map back to plus coordinates/bases '''
    seq = genes.Sequence('AACCGGTT')
    cov = Coverage(seq)
    # minus sequence is AACCGGTT again (revcomp palindrome-free? -> compute)
    minus = seq.reverse().bases
    cov.apply_hit(
        Hit(seq_nr=0, file_pos=-1, seq_pos=0, length=8, readlength=8),
        minus, on_plus_strand=False)
    assert tuple(cov.coverage) == tuple([1] * 8)
    assert cov.mutations == {}

    # a mutation on the minus strand appears complemented on plus
    mutated = minus[:2] + ('A' if minus[2] != 'A' else 'C') + minus[3:]
    cov2 = Coverage(genes.Sequence('AACCGGTT'))
    cov2.apply_hit(
        Hit(seq_nr=0, file_pos=-1, seq_pos=0, length=8, readlength=8),
        mutated, on_plus_strand=False)
    plus_idx = 8 - 2 - 1
    assert plus_idx in cov2.mutations

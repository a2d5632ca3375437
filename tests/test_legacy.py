'''
Legacy .json format upgrades (reference kvarq/legacy.py): v0.10
(tests/testsuites keyed, per-test stats order) and v0.11 (scalar
info.fastq/size) are converted to the current format; too-old and
unconvertible files raise.
'''

import pytest

from kvarq_tpu import VERSION
from kvarq_tpu.legacy import convert_legacy_data
from kvarq_tpu.analyse import (VersionConflictException,
                               DataInconcistencyException)
from kvarq_tpu.genes import (Genotype, Reference, StaticTemplate, Test,
                             Testsuite)


def make_testsuite():
    t1 = StaticTemplate('ACGTACGTACGTACGTACGTACGTA')
    t2 = StaticTemplate('TTTTACGTACGTACGTACGTACGTG')
    ref = Reference('test data')
    tests = [Test(t1, Genotype('g1'), ref),
             Test(t2, Genotype('g2'), ref)]
    return {'suite': Testsuite(tests, '0.1')}, tests


def v10_data(tests):
    cov = '1-2-3 '
    return {
        'info': {'format': 'kvarq', 'version': '0.10.3',
                 'fastq': 'f.fastq', 'size': 123},
        'tests': [str(t) for t in tests],
        'testsuites': {
            'suite': {str(t): cov for t in tests},
        },
        'stats': {
            'nseqhits': [10, 20, 30, 40],        # fwd x2, rev x2
            'nseqbasehits': [1, 2, 3, 4],
        },
        'analyses': {},
    }


def test_v10_converts():
    testsuites, tests = make_testsuite()
    data = v10_data(tests)
    out = convert_legacy_data(testsuites, data)
    # coverages keyed by template identifier
    assert [k for k, v in out['coverages']] == \
        [str(t.template) for t in tests]
    assert 'tests' not in out and 'testsuites' not in out
    # stats remapped: forward then reverse per coverage
    assert out['stats']['nseqhits'] == [10, 20, 30, 40]
    # v0.11 step also applied: fastq/size become lists
    assert out['info']['fastq'] == ['f.fastq']
    assert out['info']['size'] == [123]


def test_v10_extra_test_discarded():
    testsuites, tests = make_testsuite()
    data = v10_data(tests)
    data['tests'].append('unknown::TTT')
    data['testsuites']['suite']['unknown::TTT'] = '9 '
    # stats carry one forward + one reverse entry per test
    data['stats']['nseqhits'] = [10, 20, 99, 30, 40, 99]
    data['stats']['nseqbasehits'] = [1, 2, 9, 3, 4, 9]
    out = convert_legacy_data(testsuites, data)
    assert len(out['coverages']) == 2
    assert out['stats']['nseqhits'] == [10, 20, 30, 40]


def test_v10_contradicting_coverages_raise():
    testsuites, tests = make_testsuite()
    # two tests sharing one template with different coverages
    shared = tests[0].template
    tests2 = [Test(shared, Genotype('a'), Reference('r')),
              Test(shared, Genotype('b'), Reference('r'))]
    testsuites = {'suite': Testsuite(tests2, '0.1')}
    data = v10_data(tests2)
    data['testsuites']['suite'][str(tests2[0])] = '1-1-1 '
    data['testsuites']['suite'][str(tests2[1])] = '2-2-2 '
    with pytest.raises(DataInconcistencyException):
        convert_legacy_data(testsuites, data)


def test_v11_converts():
    testsuites, tests = make_testsuite()
    data = {
        'info': {'format': 'kvarq', 'version': '0.11.0',
                 'fastq': 'f.fastq', 'size': 7},
        'coverages': [],
        'stats': {},
        'analyses': {},
    }
    out = convert_legacy_data(testsuites, data)
    assert out['info']['fastq'] == ['f.fastq']
    assert out['info']['size'] == [7]


def test_too_old_raises():
    testsuites, tests = make_testsuite()
    data = {'info': {'format': 'kvarq', 'version': '0.9.0'}}
    with pytest.raises(VersionConflictException):
        convert_legacy_data(testsuites, data)


def test_current_passthrough():
    testsuites, tests = make_testsuite()
    data = {
        'info': {'format': 'kvarq', 'version': VERSION,
                 'fastq': ['f.fastq'], 'size': [7]},
        'coverages': [],
    }
    out = convert_legacy_data(testsuites, data)
    assert out['info']['fastq'] == ['f.fastq']

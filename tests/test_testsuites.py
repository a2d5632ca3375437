'''
Testsuite registry tests (ported from reference tests/test_testsuites.py):
name mapping and version-compatibility gates of update_testsuites.
'''

import logging
import os.path

import pytest

from kvarq_tpu.versions import StrictVersion
from kvarq_tpu.testsuites import (discover_testsuites, load_testsuites,
                                  update_testsuites)
from kvarq_tpu.analyse import TestsuiteVersionConflictException
from kvarq_tpu.log import lo

HERE = os.path.abspath(os.path.dirname(__file__))
TESTSUITES_ALT = os.path.join(HERE, 'override_testsuites')


@pytest.fixture(scope='module')
def loaded():
    lo.setLevel(logging.WARNING)
    paths = discover_testsuites([TESTSUITES_ALT])
    suites = load_testsuites(paths, ['MTBC'])
    yield paths, suites
    lo.setLevel(logging.INFO)


def test_update_testsuites(loaded):
    testsuite_paths, testsuites = loaded

    v = StrictVersion(testsuites['MTBC/test'].version)
    # load by full name
    ts = {}
    update_testsuites(ts, {'MTBC/test': str(v)}, testsuite_paths)
    assert list(ts.keys()) == ['MTBC/test']
    # load by short name
    update_testsuites(ts, {'test': str(v)}, testsuite_paths)
    assert set(ts.keys()) == set(['MTBC/test', 'test'])
    assert ts['test'] == ts['MTBC/test']

    # older minor version in json: compatible
    vv = list(v.version)
    vv[1] -= 1
    v.version = vv
    update_testsuites(ts, {'test': str(v)}, testsuite_paths)
    assert set(ts.keys()) == set(['MTBC/test', 'test'])

    # future minor version: incompatible
    vv[1] += 2
    v.version = vv
    with pytest.raises(TestsuiteVersionConflictException):
        update_testsuites(ts, {'test': str(v)}, testsuite_paths)

    # different major version: incompatible
    vv[1] -= 1
    vv[0] -= 1
    v.version = vv
    with pytest.raises(TestsuiteVersionConflictException):
        update_testsuites(ts, {'test': str(v)}, testsuite_paths)


def test_unknown_testsuite(loaded):
    from kvarq_tpu.genes import TestsuiteLoadingException
    testsuite_paths, _ = loaded
    with pytest.raises(TestsuiteLoadingException):
        update_testsuites({}, {'nonexistent': '1.0'}, testsuite_paths)


def test_strictversion():
    assert StrictVersion('1.2') < StrictVersion('1.10')
    assert StrictVersion('0.12.3a1') < StrictVersion('0.12.3')
    assert StrictVersion('1.2.1') > StrictVersion('1.2')
    assert StrictVersion('1.2') == StrictVersion('1.2.0')
    assert str(StrictVersion('1.2.0')) == '1.2'
    assert StrictVersion('0.7').version == (0, 7, 0)

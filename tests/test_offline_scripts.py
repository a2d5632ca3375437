'''
Offline analysis scripts (``analyse/convert.py``, ``analyse/matrix.py``
-- reference analyse/{convert,matrix}.py): the version-0 json upgrade
with int32-overflow repair, and the comparison-matrix helpers +
subcommand flows driven headlessly (``-n``).
'''

import importlib.util
import json
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), '..')


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, 'analyse', name + '.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def convert():
    return _load('convert')


@pytest.fixture(scope='module')
def matrix():
    return _load('matrix')


def test_unwrap_positions(convert):
    # int32 wraparound: negative positions get 2^32 added; a
    # negative -> nonnegative transition counts as a suspicious flip
    fixed, flips = convert.unwrap_positions('10,-20,30')
    assert fixed == '10,%d,30' % (2 ** 32 - 20)
    assert flips == 1
    fixed, flips = convert.unwrap_positions('1,2,3')
    assert (fixed, flips) == ('1,2,3', 0)


def test_convert_v0_upgrade(convert):
    data = {
        'hits': {'spoligo1': '1,-7,5', 'rpoB': '9'},
        'spoligo': '400000000000001',
        'lineage': 'lineage 3',
    }
    msgs = []
    out = convert.convert_v0(data, report=msgs.append)
    assert out['analyses'] == {'spoligo': '400000000000001',
                               'lineage': 'lineage 3'}
    assert 'spoligo' not in out and 'lineage' not in out
    assert out['hits']['spoligo1'] == '1,%d,5' % (2 ** 32 - 7)
    assert out['info']['format'] == 'kvarq'
    assert 'overflow' in out['info']['descr']
    assert msgs and 'spoligo1' in msgs[0]


def test_convert_main_passthrough_and_upgrade(convert, tmp_path, capsys):
    # current-format files pass through unchanged
    cur = {'info': {'format': 'kvarq'}, 'analyses': {}}
    p = tmp_path / 'cur.json'
    p.write_text(json.dumps(cur))
    convert.main([str(p)])
    assert json.loads(capsys.readouterr().out) == cur
    # v0 files are upgraded
    v0 = {'hits': {'a': '1'}, 'spoligo': 'x', 'lineage': 'y'}
    p2 = tmp_path / 'v0.json'
    p2.write_text(json.dumps(v0))
    convert.main([str(p2)])
    out = json.loads(capsys.readouterr().out)
    assert out['analyses'] == {'spoligo': 'x', 'lineage': 'y'}


def test_matrix_helpers(matrix):
    bits = matrix.oct2bin('7' * 14 + '1')
    assert len(bits) == 43
    assert bits[:3] == [1, 1, 1] and bits[-1] == 1
    assert matrix.oct2bin('0' * 15) == [0] * 43

    assert matrix.lineage_equal('lineage 2', 'lineage 2')
    assert matrix.lineage_equal('lineage 2/beijing', 'lineage 2')
    assert matrix.lineage_equal('lineage 2', 'lineage 2/beijing')
    assert not matrix.lineage_equal('lineage 2', 'lineage 3')

    data = {'analyses': {'MTBC/phylo': 'lineage 4'}}
    assert matrix.result_scalar(data, 'lineage') == 'lineage 4'
    data = {'analyses': {'lineage': ['a', 'b']}}
    assert matrix.result_scalar(data, 'lineage') == 'a; b'
    with pytest.raises(KeyError):
        matrix.result_scalar({'analyses': {}}, 'lineage')

    assert matrix.match_percentage(3, 1) == 75


def _result_json(lineage, spoligo='400000000000001', nspacer_hits=()):
    hits = {'spoligo%d' % i: ','.join(['1'] * n)
            for i, n in nspacer_hits}
    return {
        'info': {'format': 'kvarq'},
        'analyses': {'MTBC/phylo': lineage, 'MTBC/spoligo': spoligo},
        'hits': hits,
    }


def test_matrix_lineage_flow(matrix, tmp_path, capsys):
    files = []
    for name, lin in (('s1', 'lineage 3'), ('s2', 'lineage 2/beijing')):
        p = tmp_path / (name + '.json')
        p.write_text(json.dumps(_result_json(lin)))
        files.append(str(p))
    ref = tmp_path / 'ref.json'
    ref.write_text(json.dumps({'s1': {'lineage': 'lineage 3'},
                               's2': {'lineage': 'lineage 2'}}))
    matrix.main(['-n', '-v', '-r', str(ref), 'lineage'] + files)
    out = capsys.readouterr().out
    assert '100 % matches' in out


def test_matrix_spoligo_and_hitmap_flow(matrix, tmp_path):
    files = []
    for name in ('s1', 's2'):
        p = tmp_path / (name + '.json')
        p.write_text(json.dumps(_result_json(
            'lineage 3', nspacer_hits=((0, 4), (14, 2)))))
        files.append(str(p))
    # headless (-n): flows must run without matplotlib or reference
    matrix.main(['-n', 'spoligo'] + files)
    matrix.main(['-n', 'hitmap'] + files)

'''
End-to-end CLI tests (ported from reference tests/test_cli.py): version,
usage, testsuite discovery precedence, and the golden scan+illustrate runs
on the two real-data fixtures.
'''

import io
import logging
import os
import os.path
import sys
import tempfile
import time

import pytest

from kvarq_tpu import VERSION
import kvarq_tpu.cli
from kvarq_tpu.log import lo

HERE = os.path.abspath(os.path.dirname(__file__))
MTBC_fastq1 = os.path.join(HERE, 'fastqs', 'L3_N1014_hits_5k.fastq')
MTBC_fastq2 = os.path.join(HERE, 'fastqs', 'N0116_1_hits_1k.fastq')
TESTSUITES_ALT = os.path.join(HERE, 'override_testsuites')

needs_genome = pytest.mark.skipif(
    not os.path.exists(os.path.join(
        HERE, os.pardir, 'testsuites', 'MTBC',
        'MTB_ancestor_reference.bases')),
    reason='run tools/reconstruct_genome.py first')


@pytest.fixture(autouse=True)
def in_tests_dir():
    cwd = os.getcwd()
    os.chdir(HERE)
    yield
    os.chdir(cwd)


def main(args, err=0):
    stdout, stderr = sys.stdout, sys.stderr
    strout = sys.stdout = io.StringIO()
    strerr = sys.stderr = io.StringIO()
    try:
        kvarq_tpu.cli.main(args)
    except SystemExit as e:
        assert e.code == err, (
            'expected error code=%d' % err
            + '\n\nstdout: ' + strout.getvalue()
            + '\n\nstderr: ' + strerr.getvalue())
    finally:
        sys.stdout, sys.stderr = stdout, stderr
    return strout.getvalue(), strerr.getvalue()


def test_version():
    out, err = main(['version'])
    assert out.strip('\n\r') == VERSION


def test_usage():
    out, err = main(['-h'])
    assert out.startswith('usage:')


def get_testsuites(out):
    line = [line for line in out.split('\n')
            if line.startswith('testsuites=')][0]
    return set(ts for ts in line[line.index('=') + 1:].split(',') if ts)


def name_and_version(testsuites):
    return set(ts[:ts.find('[')] for ts in testsuites)


def name_only(testsuites):
    return set(ts[:ts.find('-')] for ts in testsuites)


@needs_genome
def test_load_testsuites():
    out, err = main(['info'])
    assert get_testsuites(out) == set()

    lo.setLevel(logging.WARNING)
    try:
        MTBC_testsuites = set(['MTBC/phylo', 'MTBC/resistance',
                               'MTBC/spoligo'])

        # select single testsuite
        out, err = main(['info', '-l', 'MTBC/phylo'])
        assert name_only(get_testsuites(out)) == set(['MTBC/phylo'])

        # select group
        out, err = main(['info', '-l', 'MTBC'])
        assert name_only(get_testsuites(out)) == MTBC_testsuites

        # select testsuite by filename
        path = os.path.join(TESTSUITES_ALT, 'MTBC', 'phylo.py')
        out, err = main(['info', '-l', path])
        assert name_and_version(get_testsuites(out)) == set(['MTBC/phylo-0.0'])

        # override testsuite directory using switch
        out, err = main(['info', '-l', 'MTBC/phylo'])
        assert name_and_version(get_testsuites(out)) != set(['MTBC/phylo-0.0'])
        out, err = main(['-t', TESTSUITES_ALT, 'info', '-l', 'MTBC/phylo'])
        assert name_and_version(get_testsuites(out)) == set(['MTBC/phylo-0.0'])

        # override using KVARQ_TESTSUITES
        os.environ['KVARQ_TESTSUITES'] = TESTSUITES_ALT
        try:
            out, err = main(['info', '-l', 'MTBC/phylo'])
            assert name_and_version(get_testsuites(out)) == \
                set(['MTBC/phylo-0.0'])
        finally:
            del os.environ['KVARQ_TESTSUITES']

        # load all
        t0 = time.time()
        out, err = main(['info', '-L'])
        assert len(name_only(get_testsuites(out))) > 4
        if time.time() - t0 > 2:
            lo.warning('loading all testsuites takes %.2f'
                       % (time.time() - t0))
    finally:
        lo.setLevel(logging.INFO)


def scan_illustrate(fastq, scan_params=[]):
    ntf = tempfile.NamedTemporaryFile(delete=False)
    ntf.close()
    lo.setLevel(logging.WARNING)
    try:
        t0 = time.time()
        out, err = main(['scan', '-l', 'MTBC', '-f'] + scan_params +
                        [fastq, ntf.name])
        if time.time() - t0 > 10:
            lo.warning('scanning of %s took %.2fs'
                       % (os.path.basename(fastq), time.time() - t0))
        out, err = main(['illustrate', '-r', ntf.name])
    finally:
        lo.setLevel(logging.INFO)
        os.remove(ntf.name)
    return out, err


@needs_genome
def test_scan_illustrate():
    ''' golden end-to-end (reference tests/test_cli.py:150-174) '''
    lo.setLevel(logging.WARNING)

    out, err = scan_illustrate(MTBC_fastq1, ['--variant', 'Illumina 1.8+'])
    for resistance in [
            'Streptomycin resistance::SNP781687AG=rpsL.K43R',
            'Ethambutol resistance::SNP4247431GT=embB.M306I',
            'Isoniazid resistance [2155168CG=katG.S315T]',
            'Rifampicin resistance (RRDR) '
            '[761139CG=rpoB.H445D 761140AG=rpoB.H445R]',
            'remark: low coverage (RRDR below 10x)']:
        assert resistance in out, MTBC_fastq1 + ' should have ' + resistance
    assert 'lineage 3' in out, MTBC_fastq1 + ' should be Lineage 3'

    out, err = scan_illustrate(MTBC_fastq2)
    for resistance in [
            'Streptomycin resistance::SNP781687AG=rpsL.K43R',
            'remark: low coverage (RRDR below 10x)']:
        assert resistance in out, MTBC_fastq2 + ' should have ' + resistance
    assert 'lineage 2' in out, MTBC_fastq2 + ' should be Lineage 2'

    lo.setLevel(logging.INFO)


@needs_genome
def test_scan_hits_extract(tmp_path):
    ''' -H stores the hit list in the json; -x writes the full FastQ
        records of every hit (reference cli.py:441-445, analyse.py:536) '''
    lo.setLevel(logging.WARNING)
    try:
        import json
        jpath = str(tmp_path / 'out.json')
        xpath = str(tmp_path / 'hits.fastq')
        main(['scan', '-l', 'MTBC/phylo', '-f', '-H', '-x', xpath,
              MTBC_fastq2, jpath])
        data = json.load(open(jpath))
        assert 'hits' in data and len(data['hits'])
        assert 'hitseqs' in data and \
            len(data['hitseqs']) == len(data['hits'])
        # every hit record is a well-formed FastQ record
        lines = open(xpath).read().strip().split('\n')
        assert len(lines) % 4 == 0 and len(lines) // 4 == len(data['hits'])
        assert all(ln.startswith('@') for ln in lines[0::4])
        assert all(ln.startswith('+') for ln in lines[2::4])

        # scanning with -H produces the same analyses as without
        jpath2 = str(tmp_path / 'out2.json')
        main(['scan', '-l', 'MTBC/phylo', '-f', MTBC_fastq2, jpath2])
        data2 = json.load(open(jpath2))
        assert data['analyses'] == data2['analyses']
        assert data['coverages'] == data2['coverages']
    finally:
        lo.setLevel(logging.INFO)


@needs_genome
def test_scan_update_summarize(tmp_path):
    ''' update recomputes identical results; summarize emits csv '''
    lo.setLevel(logging.WARNING)
    try:
        jpath = str(tmp_path / 'out.json')
        main(['scan', '-l', 'MTBC/phylo', '-f', MTBC_fastq2, jpath])
        import json
        before = json.load(open(jpath))
        main(['update', jpath])
        after = json.load(open(jpath))
        assert before['analyses'] == after['analyses']
        assert before['coverages'] == after['coverages']

        out, err = main(['summarize', jpath])
        lines = out.strip().split('\n')
        assert lines[0].startswith('filename,filesize,scantime')
        assert jpath in out
    finally:
        lo.setLevel(logging.INFO)


@needs_genome
def test_scan_mesh(tmp_path):
    ''' --mesh shards the scan over the virtual 8-device mesh and must
        produce byte-identical analyses/coverages/stats to the
        single-device scan (kvarq_tpu.parallel) '''
    import json
    lo.setLevel(logging.WARNING)
    try:
        jref = str(tmp_path / 'single.json')
        main(['scan', '-l', 'MTBC/phylo', '-f', MTBC_fastq2, jref])
        ref = json.load(open(jref))

        for mesh in ('4x2', 'auto'):
            jpath = str(tmp_path / ('mesh_%s.json' % mesh))
            main(['scan', '-l', 'MTBC/phylo', '-f', '--mesh', mesh,
                  MTBC_fastq2, jpath])
            data = json.load(open(jpath))
            assert data['analyses'] == ref['analyses'], mesh
            assert data['coverages'] == ref['coverages'], mesh
            assert data['stats']['nseqhits'] == ref['stats']['nseqhits']

    finally:
        from kvarq_tpu import engine
        engine.config(mesh='')
        lo.setLevel(logging.INFO)


def test_scan_mesh_hits(tmp_path):
    ''' --mesh with -H (the sharded hit path, parallel.ShardedMatcher):
        the hit list -- including every file_pos -- must be identical to
        the unsharded -H scan '''
    import json
    lo.setLevel(logging.WARNING)
    try:
        jref = str(tmp_path / 'single.json')
        main(['scan', '-l', 'MTBC/phylo', '-f', '-H', MTBC_fastq2, jref])
        ref = json.load(open(jref))
        assert ref['hits']                   # fixture produces hits

        jpath = str(tmp_path / 'mesh_hits.json')
        main(['scan', '-l', 'MTBC/phylo', '-f', '--mesh', '4x2', '-H',
              MTBC_fastq2, jpath])
        data = json.load(open(jpath))
        assert data['hits'] == ref['hits']
        assert data['analyses'] == ref['analyses']
        assert data['stats']['nseqhits'] == ref['stats']['nseqhits']
    finally:
        from kvarq_tpu import engine
        engine.config(mesh='')
        lo.setLevel(logging.INFO)


@needs_genome
def test_batch(tmp_path):
    ''' `kvarq batch` scans a corpus into one merged json; a single-file
        batch must produce the same analyses/coverages as `kvarq scan`
        of that file, and a two-file batch must count both files '''
    import json
    lo.setLevel(logging.WARNING)
    try:
        jref = str(tmp_path / 'single.json')
        main(['scan', '-l', 'MTBC/phylo', '-f', '-P', MTBC_fastq2, jref])
        ref = json.load(open(jref))

        jbatch = str(tmp_path / 'batch1.json')
        main(['batch', '-l', 'MTBC/phylo', '-f', MTBC_fastq2, jbatch])
        data = json.load(open(jbatch))
        assert data['analyses'] == ref['analyses']
        assert data['coverages'] == ref['coverages']
        assert data['stats']['nseqhits'] == ref['stats']['nseqhits']
        assert data['stats']['records_parsed'] \
            == ref['stats']['records_parsed']

        # a corpus merges: scanning the file twice doubles every count
        jboth = str(tmp_path / 'batch2.json')
        main(['batch', '-l', 'MTBC/phylo', '-f',
              MTBC_fastq2, MTBC_fastq2, jboth])
        both = json.load(open(jboth))
        assert both['stats']['records_parsed'] \
            == 2 * ref['stats']['records_parsed']
        assert both['stats']['nseqhits'] \
            == [2 * n for n in ref['stats']['nseqhits']]
        # refuses to overwrite without -f
        main(['batch', '-l', 'MTBC/phylo', MTBC_fastq2, jbatch],
             err=kvarq_tpu.cli.ERROR_FILE_EXISTS)
    finally:
        lo.setLevel(logging.INFO)


@needs_genome
def test_batch_per_sample(tmp_path):
    ''' `kvarq batch --per-sample` writes one result json per sample into
        a directory plus summary.csv; outputs equal a plain `kvarq scan`
        of the same file; `--resume` restarts an interrupted batch without
        redoing completed samples (and redoes corrupt ones) '''
    import json
    lo.setLevel(logging.WARNING)
    try:
        outdir = str(tmp_path / 'results')
        main(['batch', '--per-sample', '-l', 'MTBC/phylo',
              MTBC_fastq1, MTBC_fastq2, outdir])
        j1 = os.path.join(outdir, 'L3_N1014_hits_5k.json')
        j2 = os.path.join(outdir, 'N0116_1_hits_1k.json')
        d1 = json.load(open(j1))
        d2 = json.load(open(j2))
        assert d1['info']['format'] == 'kvarq'
        assert 'MTBC/phylo' in d1['analyses']
        csv_text = open(os.path.join(outdir, 'summary.csv')).read()
        assert 'L3_N1014_hits_5k' in csv_text
        assert 'N0116_1_hits_1k' in csv_text

        # per-sample result equals a plain `kvarq scan` of the same file
        jref = str(tmp_path / 'ref.json')
        main(['scan', '-l', 'MTBC/phylo', '-f', '-P', MTBC_fastq2, jref])
        ref = json.load(open(jref))
        assert d2['analyses'] == ref['analyses']
        assert d2['coverages'] == ref['coverages']
        assert d2['stats']['nseqhits'] == ref['stats']['nseqhits']

        # without --resume/-f existing outputs refuse to be overwritten
        main(['batch', '--per-sample', '-l', 'MTBC/phylo',
              MTBC_fastq2, outdir], err=kvarq_tpu.cli.ERROR_FILE_EXISTS)

        # --resume skips completed samples: outputs untouched...
        before = os.path.getmtime(j2)
        main(['batch', '--per-sample', '--resume', '-l', 'MTBC/phylo',
              MTBC_fastq1, MTBC_fastq2, outdir])
        assert os.path.getmtime(j2) == before

        # ...but redoes a corrupt/partial one
        with open(j1, 'w') as fd:
            fd.write('{not json')
        main(['batch', '--per-sample', '--resume', '-l', 'MTBC/phylo',
              MTBC_fastq1, MTBC_fastq2, outdir])
        assert json.load(open(j1))['info']['format'] == 'kvarq'

        # a non-fastq input fails cleanly; the rest of the batch runs
        out2 = str(tmp_path / 'r2')
        main(['batch', '--per-sample', '-l', 'MTBC/phylo',
              MTBC_fastq2, 'nope.txt', out2],
             err=kvarq_tpu.cli.ERROR_FASTQ_FORMAT_ERROR)
        assert os.path.exists(os.path.join(out2, 'N0116_1_hits_1k.json'))

        # same basename from two directories: _2 suffix, no overwrite
        import shutil
        dupdir = tmp_path / 'dup'
        dupdir.mkdir()
        dup = str(dupdir / os.path.basename(MTBC_fastq2))
        shutil.copy(MTBC_fastq2, dup)
        out3 = str(tmp_path / 'r3')
        main(['batch', '--per-sample', '-l', 'MTBC/phylo',
              MTBC_fastq2, dup, out3])
        assert os.path.exists(os.path.join(out3, 'N0116_1_hits_1k.json'))
        assert os.path.exists(
            os.path.join(out3, 'N0116_1_hits_1k_2.json'))
    finally:
        lo.setLevel(logging.INFO)


@needs_genome
def test_scan_profile(tmp_path):
    ''' --profile persists a per-phase wall-time breakdown into
        info.phases (and, with a DIR, a JAX profiler trace); without the
        flag the json schema is unchanged '''
    import json
    lo.setLevel(logging.WARNING)
    try:
        jpath = str(tmp_path / 'prof.json')
        tdir = str(tmp_path / 'trace')
        main(['scan', '-l', 'MTBC/phylo', '-f', '--profile', tdir,
              MTBC_fastq2, jpath])
        info = json.load(open(jpath))['info']
        assert 'phases' in info
        for phase in ('scan', 'analyse', 'total'):
            assert phase in info['phases']
            assert info['phases'][phase] >= 0
        assert info['phases']['total'] >= info['phases']['scan']
        assert os.path.isdir(tdir)   # trace directory was created

        jplain = str(tmp_path / 'plain.json')
        main(['scan', '-l', 'MTBC/phylo', '-f', MTBC_fastq2, jplain])
        assert 'phases' not in json.load(open(jplain))['info']
    finally:
        lo.setLevel(logging.INFO)

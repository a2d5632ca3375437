'''
Differential tests for the fast whole-input gzip decoder
(csrc/kvq_fast_inflate.h) that feeds the ring producer: builds and runs
tools/fast_inflate_test.cpp (payload x level x header-variant x
multi-member matrix vs zlib, truncation, corruption fuzz, CLMUL-vs-table
CRC cross-check), plus end-to-end reader checks that gz input equals
plain input byte for byte through the full pipeline with the fast path
on and off.
'''

import gzip
import os
import subprocess
import sys

import pytest

HERE = os.path.abspath(os.path.dirname(__file__))
ROOT = os.path.dirname(HERE)
SRC = os.path.join(ROOT, 'tools', 'fast_inflate_test.cpp')


def _build(binpath, extra):
    cmd = ['g++', '-O2', '-g'] + extra + [SRC, '-lz', '-o', binpath]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip('cannot build harness: %s' % r.stderr[-400:])
    return binpath


def test_matrix(tmp_path):
    b = _build(str(tmp_path / 'fi_test'),
               ['-march=x86-64-v3', '-mpclmul'])
    r = subprocess.run([b], capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr


def test_matrix_generic_no_clmul(tmp_path):
    ''' the portable build (no SIMD CRC, scalar everything) must pass
        the same matrix '''
    b = _build(str(tmp_path / 'fi_generic'), [])
    r = subprocess.run([b], capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.parametrize('fast', ['1', '0'])
def test_reader_gz_equals_plain(tmp_path, fast):
    ''' the native reader must deliver identical batches for x.fastq and
        x.fastq.gz with the fast ring on and off '''
    from kvarq_tpu.engine import native, reader

    if not native.available():
        pytest.skip('native reader unavailable')

    src = os.path.join(HERE, 'fastqs', 'L3_N1014_hits_5k.fastq')
    plain = str(tmp_path / 'x.fastq')
    with open(src, 'rb') as f:
        data = f.read() * 3
    with open(plain, 'wb') as f:
        f.write(data)
    gzp = str(tmp_path / 'x.fastq.gz')
    with gzip.open(gzp, 'wb', compresslevel=6) as f:
        f.write(data)

    def drain(fname):
        os.environ['KVARQ_FAST_INFLATE'] = fast
        try:
            stats = reader.ReaderStats()
            out = []
            for b in native.batches([fname], ord('!'), 25, stats,
                                    batchsize=512, nthreads=2):
                out.append((b.codes.tobytes(), b.rl.tobytes(),
                            b.filepos.tobytes()))
            return out, stats.records_parsed
        finally:
            del os.environ['KVARQ_FAST_INFLATE']

    got_p, n_p = drain(plain)
    got_z, n_z = drain(gzp)
    assert n_p == n_z
    assert got_p == got_z

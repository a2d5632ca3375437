'''
The GENERIC (no -march, no AVX2) build of the native reader must keep
exactly the same candidate set as the default build and the numpy
oracle.  This is the portability fallback for pre-AVX2 hosts
(kvarq_tpu/engine/native.py builds it when the CPU lacks AVX2), and it
exercises all the scalar fallback paths of the SIMD code -- including
the sieve's scalar packer, whose tail-zeroing once assumed the SIMD
loop had run first (caught in round-4 review: reads with their only
template match beyond base ~96 were silently dropped).
'''

import os
import subprocess

import numpy as np
import pytest

from kvarq_tpu.engine import native, reader
from kvarq_tpu.engine.sieve import KmerSieve

SRC = os.path.join(os.path.dirname(__file__), '..', 'csrc', 'reader.cpp')


@pytest.fixture(scope='module')
def generic_lib(tmp_path_factory):
    out = str(tmp_path_factory.mktemp('generic') / '_reader_gen.so')
    try:
        subprocess.run(
            ['g++', '-O2', '-shared', '-fPIC', '-pthread', '-o', out,
             SRC, '-lz'],
            check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        pytest.skip('cannot build the generic variant')
    return out


def _drain(libpath, fname, sieve):
    saved = (native._lib, native._lib_failed, native.LIB)
    native._lib = None
    native._lib_failed = False
    native.LIB = libpath
    try:
        assert native.get_lib() is not None
        stats = reader.ReaderStats()
        out = []
        for b in native.batches([fname], 33, 10, stats, batchsize=256,
                                sieve=sieve, nthreads=2):
            out.append((b.codes.copy(), b.rl.copy(), b.filepos.copy()))
        return stats.records_parsed, out
    finally:
        native._lib, native._lib_failed, native.LIB = saved


def test_generic_build_sieve_parity(generic_lib, tmp_path):
    ''' long reads with the only template hit planted at every offset,
        including deep tail positions (> 96 bp, where the scalar packer
        once read uninitialized state) '''
    rng = np.random.RandomState(13)
    bases = np.frombuffer(b'ACGT', np.uint8)
    templates = [bytes(bases[rng.randint(4, size=40)]).decode()
                 for _ in range(6)]
    sieve = KmerSieve.build(templates, 2, 25, 25)
    assert sieve is not None

    recs = []
    for i in range(2000):
        read = bases[rng.randint(4, size=150)]
        t = templates[rng.randint(len(templates))].encode()
        off = rng.randint(0, 150 - len(t) + 1)   # incl. tail positions
        read[off:off + len(t)] = np.frombuffer(t, np.uint8)
        qual = b'I' * 150
        recs.append(b'@r%d\n%s\n+\n%s\n' % (i, read.tobytes(), qual))
    path = str(tmp_path / 'tail.fastq')
    with open(path, 'wb') as f:
        f.write(b''.join(recs))

    n_def, ref = _drain(native.LIB, path, sieve)
    n_gen, got = _drain(generic_lib, path, sieve)
    assert n_gen == n_def == 2000
    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    # every read contains a planted template: all must be candidates
    assert sum(len(b[1]) for b in ref) == 2000


def test_generic_build_full_parity(generic_lib, tmp_path):
    ''' generic build == numpy pipeline on adversarial fastq shapes '''
    rng = np.random.RandomState(21)
    alpha = np.frombuffer(b'ACGTN', np.uint8)
    recs = []
    for i in range(400):
        L = int(rng.randint(1, 200))
        bases_ = bytes(rng.choice(alpha, L))
        qual = bytes(rng.randint(33, 74, L).astype(np.uint8))
        recs.append(b'@r%d x\n%s\n+\n%s\n' % (i, bases_, qual))
    path = str(tmp_path / 'adv.fastq')
    with open(path, 'wb') as f:
        f.write(b''.join(recs))

    n_gen, got = _drain(generic_lib, path, None)
    os.environ['KVARQ_NATIVE'] = '0'
    try:
        stats = reader.ReaderStats()
        ref = []
        for b in reader.batches([path], 33, 10, stats, batchsize=256):
            ref.append((b.codes.copy(), b.rl.copy(), b.filepos.copy()))
    finally:
        os.environ.pop('KVARQ_NATIVE')
    assert n_gen == stats.records_parsed
    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

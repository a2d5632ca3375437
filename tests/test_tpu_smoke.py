'''
Real-hardware bit-exactness: scans a small synthetic FastQ with the
device (pallas/XLA) paths and asserts hit statistics AND per-position
base counts equal the byte-exact numpy oracle.

Runs only with ``KVARQ_TEST_TPU=1`` (conftest pins the suite to CPU
otherwise); ``bench.py`` performs the same gate on every benchmark run,
so a miscounting kernel can never ship a perf number silently.
'''

import os

import numpy as np
import pytest

needs_tpu = pytest.mark.skipif(
    os.environ.get('KVARQ_TEST_TPU') != '1',
    reason='set KVARQ_TEST_TPU=1 (with a TPU attached) to run')


def _synthetic_case(tmp_path, n_reads=4096, readlen=101, seed=7):
    import bench
    rng = np.random.RandomState(seed)
    seqs = []
    for _ in range(40):
        n = rng.randint(30, 90)
        seqs.append(bytes(rng.choice(
            np.frombuffer(b'ACGT', np.uint8), n)).decode())
    path = str(tmp_path / 'smoke.fastq')
    bench.generate_fastq(path, seqs, n_reads, readlen, seed=seed)
    return path, seqs


@needs_tpu
def test_device_matches_oracle(tmp_path):
    import jax
    assert jax.default_backend() != 'cpu'

    import bench
    from kvarq_tpu import engine

    path, seqs = _synthetic_case(tmp_path)
    engine.config(maxerrors=2, minoverlap=25, minreadlength=25,
                  nthreads=2, Amin=chr(33 + 13))

    ret = engine.countseqs(path, seqs)
    assert int(np.asarray(ret['stats']['nseqhits']).sum()) > 0
    # raises SystemExit on any divergence
    bench.assert_device_matches_oracle(ret, path, seqs)


@needs_tpu
def test_findseqs_backends_agree(tmp_path):
    ''' pallas hit-list path == numpy hit list on device hardware '''
    from kvarq_tpu import engine

    path, seqs = _synthetic_case(tmp_path, n_reads=2048)
    engine.config(maxerrors=2, minoverlap=25, minreadlength=25,
                  nthreads=2, Amin=chr(33 + 13))

    engine.config(backend='numpy', sieve='off')
    ref = engine.findseqs(path, seqs)
    engine.config(backend='auto', sieve='auto')
    out = engine.findseqs(path, seqs)
    assert out['hits'] == ref['hits']
    assert out['hitseqs'] == ref['hitseqs']

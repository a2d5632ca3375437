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
def test_sharded_pallas_on_hardware(tmp_path):
    ''' ShardedScanner (pallas, interpret=False, check_vma=True) on a
        real-device 1x1 mesh is bit-equal to the numpy oracle -- the
        standing gate for the multi-chip code path on actual TPU
        hardware (single chip; the N-chip topology is validated on the
        virtual CPU mesh and the driver dryrun) '''
    import jax
    assert jax.default_backend() != 'cpu'

    import bench
    from kvarq_tpu import engine
    from kvarq_tpu.parallel import make_mesh, ShardedScanner
    from kvarq_tpu.engine import reader

    path, seqs = _synthetic_case(tmp_path)
    engine.config(maxerrors=2, minoverlap=25, minreadlength=25,
                  nthreads=2, Amin=chr(33 + 13))

    mesh = make_mesh(1, 1, jax.devices()[:1])
    scanner = ShardedScanner(seqs, maxerrors=2, minoverlap=25, mesh=mesh,
                             backend='pallas')
    assert scanner.backend == 'pallas'
    stats = reader.ReaderStats()
    for batch in reader.prefetch(reader.batches(
            [path], ord(chr(33 + 13)), 25, stats, batchsize=16384,
            nthreads=2)):
        scanner.scan_batch(batch)
    scanner.finalize()
    ret = {
        'basecounts': [bc.astype(np.int64) for bc in scanner.coverages()],
        'stats': {
            'nseqhits': tuple(int(x) for x in scanner.seqhits),
            'nseqbasehits': tuple(int(x) for x in scanner.seqbasehits),
            'readlengths': tuple(
                int(x) for x in stats.rls[:stats.rls_longest + 1]),
            'records_parsed': int(stats.records_parsed),
        },
    }
    assert int(scanner.seqhits.sum()) > 0
    # raises SystemExit on any divergence from the numpy oracle
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

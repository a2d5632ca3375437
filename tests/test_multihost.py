'''
Multi-process multihost scan: two real ``jax.distributed`` CPU processes
(Gloo collectives, 4 virtual devices each) jointly run
``kvarq_tpu.parallel.multihost.scan_sharded`` over a two-file corpus --
each process streams its own file shard, contributes padding batches
after its shard is exhausted (the all-hosts vote), and merges results
with ``process_allgather`` -- and the merged result must equal the
single-process scan of the concatenated files (the reference's own
``findseqs(f) == findseqs([f1, f2])`` invariant,
reference tests/test_engine.py:184-205).
'''

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.abspath(os.path.dirname(__file__))
ROOT = os.path.dirname(HERE)

WORKER = '''
import os, sys
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]
out = sys.argv[3]
fastqs = sys.argv[4].split(',')
seqs = open(sys.argv[5]).read().split()

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
import jax
jax.config.update('jax_platforms', 'cpu')

from kvarq_tpu.parallel import multihost

multihost.initialize(coordinator_address='localhost:' + port,
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8

covs, sh, sbh = multihost.scan_sharded(
    fastqs, seqs, maxerrors=2, minoverlap=25, minreadlength=25,
    Amin=chr(33 + 13), nthreads=2, b_local=256)
np.savez(out, sh=sh, sbh=sbh,
         **{'c%d' % i: c for i, c in enumerate(covs)})
'''


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    ''' two synthetic FastQ files + a template bank with planted reads '''
    sys.path.insert(0, ROOT)
    import bench
    tmp = tmp_path_factory.mktemp('mh')
    rng = np.random.RandomState(11)
    seqs = []
    for _ in range(20):
        n = rng.randint(30, 81)
        seqs.append(bytes(rng.choice(
            np.frombuffer(b'ACGT', np.uint8), n)).decode())
    f1 = str(tmp / 'part1.fastq')
    f2 = str(tmp / 'part2.fastq')
    bench.generate_fastq(f1, seqs, 3000, 71, seed=1)
    bench.generate_fastq(f2, seqs, 2600, 71, seed=2)
    spath = str(tmp / 'seqs.txt')
    with open(spath, 'w') as f:
        f.write('\n'.join(seqs))
    return f1, f2, seqs, spath, tmp


def test_sample_max_readlen(corpus):
    f1, f2, seqs, spath, tmp = corpus
    from kvarq_tpu.parallel.multihost import sample_max_readlen
    assert sample_max_readlen([f1, f2]) == 71
    assert sample_max_readlen([str(tmp / 'missing.fastq')]) == 0


def test_auto_lpad_long_reads(corpus):
    ''' 250 bp reads (> the old fixed Lpad=128) must scan without any
        explicit Lpad: auto-sizing picks the right bucket and the result
        equals the plain engine scan (VERDICT r2 weak #3) '''
    import bench
    f1, f2, seqs, spath, tmp = corpus
    flong = str(tmp / 'long.fastq')
    bench.generate_fastq(flong, seqs, 600, 250, seed=3)

    os.environ['KVARQ_MESH'] = ''
    from kvarq_tpu import engine
    from kvarq_tpu.parallel import multihost
    engine.config(maxerrors=2, minoverlap=25, minreadlength=25,
                  nthreads=2, Amin=chr(33 + 13))
    covs, sh, sbh = multihost.scan_sharded(
        [flong], seqs, maxerrors=2, minoverlap=25, minreadlength=25,
        Amin=chr(33 + 13), nthreads=2, b_local=256)
    ret = engine.countseqs(flong, seqs)
    assert list(ret['stats']['nseqhits']) == [int(x) for x in sh]
    assert int(np.asarray(sh).sum()) > 0
    for i, bc in enumerate(ret['basecounts']):
        assert np.array_equal(np.asarray(bc, np.int64),
                              covs[i].astype(np.int64)), i


def test_two_process_scan_matches_single(corpus):
    f1, f2, seqs, spath, tmp = corpus
    port = str(_free_port())
    wpath = str(tmp / 'worker.py')
    with open(wpath, 'w') as f:
        f.write(WORKER)

    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS='cpu',
               KVARQ_MESH='')
    outs = [str(tmp / ('result_%d.npz' % i)) for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, wpath, str(i), port, outs[i],
         ','.join([f1, f2]), spath],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    # both processes computed identical merged results
    r0, r1 = np.load(outs[0]), np.load(outs[1])
    for key in r0.files:
        assert np.array_equal(r0[key], r1[key]), key

    # ... equal to the single-process scan of the concatenated corpus
    from kvarq_tpu import engine
    engine.config(maxerrors=2, minoverlap=25, minreadlength=25,
                  nthreads=2, Amin=chr(33 + 13))
    ret = engine.countseqs([f1, f2], seqs)
    assert list(ret['stats']['nseqhits']) == [int(x) for x in r0['sh']]
    assert list(ret['stats']['nseqbasehits']) == [int(x) for x in r0['sbh']]
    assert int(np.asarray(r0['sh']).sum()) > 0
    for i, bc in enumerate(ret['basecounts']):
        assert np.array_equal(np.asarray(bc, np.int64),
                              r0['c%d' % i].astype(np.int64)), i


def test_findseqs_sharded_single_process(corpus):
    ''' the hit-list corpus scan (single-process degenerate mode) must
        reproduce engine.findseqs of the concatenated files exactly --
        hits, file_pos, hitseqs '''
    f1, f2, seqs, spath, tmp = corpus
    os.environ['KVARQ_MESH'] = ''
    from kvarq_tpu import engine
    from kvarq_tpu.parallel import multihost
    engine.config(maxerrors=2, minoverlap=25, minreadlength=25,
                  nthreads=2, Amin=chr(33 + 13), mesh='')
    ref = engine.findseqs([f1, f2], seqs)
    hits, hitseqs = multihost.findseqs_sharded(
        [f1, f2], seqs, maxerrors=2, minoverlap=25, minreadlength=25,
        Amin=chr(33 + 13), nthreads=2)
    assert len(ref['hits']) > 0
    assert list(hits) == list(ref['hits'])
    assert hitseqs == ref['hitseqs']


FINDSEQS_WORKER = '''
import os, sys
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]
out = sys.argv[3]
fastqs = sys.argv[4].split(',')
seqs = open(sys.argv[5]).read().split()

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
import jax
jax.config.update('jax_platforms', 'cpu')

from kvarq_tpu.parallel import multihost

multihost.initialize(coordinator_address='localhost:' + port,
                     num_processes=2, process_id=pid)
hits, hitseqs = multihost.findseqs_sharded(
    fastqs, seqs, maxerrors=2, minoverlap=25, minreadlength=25,
    Amin=chr(33 + 13), nthreads=2)
np.savez(out, hits=np.asarray([tuple(h) for h in hits], dtype=np.int64),
         hitseqs=np.asarray(hitseqs, dtype=object), allow_pickle=True)
'''


def test_two_process_findseqs_matches_single(corpus):
    ''' two jax.distributed processes scanning their own file shards
        merge a hit list identical to the single-process scan of the
        concatenated corpus -- incl. globally rebased file_pos '''
    f1, f2, seqs, spath, tmp = corpus
    port = str(_free_port())
    wpath = str(tmp / 'worker_hits.py')
    with open(wpath, 'w') as f:
        f.write(FINDSEQS_WORKER)

    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS='cpu',
               KVARQ_MESH='')
    outs = [str(tmp / ('hits_%d.npz' % i)) for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, wpath, str(i), port, outs[i],
         ','.join([f1, f2]), spath],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    r0 = np.load(outs[0], allow_pickle=True)
    r1 = np.load(outs[1], allow_pickle=True)
    assert np.array_equal(r0['hits'], r1['hits'])

    from kvarq_tpu import engine
    engine.config(maxerrors=2, minoverlap=25, minreadlength=25,
                  nthreads=2, Amin=chr(33 + 13), mesh='')
    ref = engine.findseqs([f1, f2], seqs)
    want = np.asarray([tuple(h) for h in ref['hits']], dtype=np.int64)
    assert len(want) > 0
    assert np.array_equal(r0['hits'], want)
    assert list(r0['hitseqs']) == ref['hitseqs']

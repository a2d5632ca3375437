'''
Soundness and parity properties of the k-mer seed-and-verify sieve
(kvarq_tpu.engine.sieve + the C implementation in csrc/reader.cpp):

1. **soundness** (randomized): for any config, every read that produces a
   hit in the exhaustive matcher must survive the sieve -- scanning with
   the sieve on and off yields identical results;
2. **native parity** (randomized): the C sieve keeps exactly the reads
   the numpy oracle keeps;
3. **sharpness**: on background reads sharing no locus with the bank,
   the sieve drops (nearly) everything.
'''

import os
import tempfile

import numpy as np
import pytest

from kvarq_tpu import engine
from kvarq_tpu.engine import native, reader
from kvarq_tpu.engine.sieve import KmerSieve

BASES = np.frombuffer(b'ACGT', np.uint8)
BASES_N = np.frombuffer(b'ACGTN', np.uint8)


def write_fastq(path, reads, quals=None):
    with open(path, 'wb') as f:
        for i, r in enumerate(reads):
            q = quals[i] if quals is not None else b'I' * len(r)
            f.write(b'@r%d\n' % i + r + b'\n+\n' + q + b'\n')


def gen_workload(rng, templates, n_reads, readlen, errors, with_n=False):
    ''' reads drawn from template loci with `errors` planted mismatches,
        mixed with random background '''
    alphabet = BASES_N if with_n else BASES
    reads = []
    for i in range(n_reads):
        if i % 3 == 0:
            t = templates[rng.randint(len(templates))].encode()
            if len(t) >= readlen:
                off = rng.randint(len(t) - readlen + 1)
                r = bytearray(t[off:off + readlen])
            else:
                r = bytearray(alphabet[rng.randint(
                    len(alphabet), size=readlen)].tobytes())
                off = rng.randint(readlen - len(t) + 1)
                r[off:off + len(t)] = t
            for _ in range(errors):
                p = rng.randint(len(r))
                r[p] = alphabet[rng.randint(len(alphabet))]
            reads.append(bytes(r))
        else:
            reads.append(alphabet[rng.randint(
                len(alphabet), size=readlen)].tobytes())
    return reads


@pytest.mark.parametrize('maxerrors,minoverlap,minreadlength,with_n', [
    (0, 20, 20, False),
    (1, 20, 20, False),
    (2, 25, 25, False),
    (2, 25, 25, True),
    (3, 30, 25, False),
])
def test_sieve_soundness_random(tmp_path, maxerrors, minoverlap,
                                minreadlength, with_n):
    ''' sieve on == sieve off through the full engine, across configs '''
    rng = np.random.RandomState(maxerrors * 100 + minoverlap)
    templates = [
        BASES[rng.randint(4, size=L)].tobytes().decode()
        for L in (31, 45, 60, 120)]
    reads = gen_workload(rng, templates, 120, 80, maxerrors,
                         with_n=with_n)
    path = str(tmp_path / 'fuzz.fastq')
    write_fastq(path, reads)

    engine.config(backend='numpy', maxerrors=maxerrors,
                  minoverlap=minoverlap, minreadlength=minreadlength,
                  Amin='!', nthreads=2)
    try:
        engine.config(sieve='off')
        ret_off = engine.findseqs(path, templates)
        engine.config(sieve='auto')
        ret_on = engine.findseqs(path, templates)
    finally:
        engine.config(sieve='auto', backend='auto', nthreads=1)

    assert ret_off['hits'] == ret_on['hits']
    assert ret_off['hitseqs'] == ret_on['hitseqs']
    assert ret_off['stats'] == ret_on['stats']
    assert len(ret_on['hits']) > 0   # workload actually produces hits


@pytest.mark.skipif(not native.available(),
                    reason='native reader unavailable')
@pytest.mark.parametrize('seed', [1, 2, 3])
def test_sieve_native_parity_random(tmp_path, seed):
    ''' C sieve == numpy oracle on random reads (incl. N bases), for both
        t == 1 and t > 1 regimes '''
    rng = np.random.RandomState(seed)
    templates = [BASES_N[rng.randint(5, size=L)].tobytes().decode()
                 for L in (31, 45, 80)]
    reads = gen_workload(rng, templates, 200, 90, 2, with_n=True)
    path = str(tmp_path / 'parity.fastq')
    write_fastq(path, reads)

    # k = m // (me+1): 8, 12 (base-5 fallback, no 2-bit index), 7, 11
    # (largest 2-bit-indexed k), 6 (MIN_USEFUL_K); (2, 26) makes t = 3,
    # the exact-SeedState regime of the 2-bit/hash path (t == 2 takes
    # the bloom fast path, t == 1 verifies every seed immediately)
    for me, mo, mrl in [(2, 25, 25), (0, 12, 12), (1, 14, 14),
                        (0, 11, 11), (0, 6, 6), (2, 26, 26)]:
        sieve = KmerSieve.build(templates, me, mo, mrl)
        if sieve is None:
            continue
        s1, s2 = reader.ReaderStats(), reader.ReaderStats()
        b1 = list(native.batches([path], ord('!'), mrl, s1, 64,
                                 sieve=sieve))
        os.environ['KVARQ_NATIVE'] = '0'
        try:
            b2 = list(reader.batches([path], ord('!'), mrl, s2, 64,
                                     sieve=sieve))
        finally:
            os.environ.pop('KVARQ_NATIVE')
        f1 = np.concatenate([b.filepos for b in b1]) if b1 else []
        f2 = np.concatenate([b.filepos for b in b2]) if b2 else []
        np.testing.assert_array_equal(f1, f2)
        assert s1.records_parsed == s2.records_parsed


def test_sieve_sharpness():
    ''' background reads sharing no locus with the bank are dropped '''
    rng = np.random.RandomState(7)
    templates = [BASES[rng.randint(4, size=60)].tobytes().decode()
                 for _ in range(8)]
    sieve = KmerSieve.build(templates, 2, 25, 25)
    assert sieve is not None and sieve.t >= 2

    codes = rng.randint(0, 4, size=(512, 101)).astype(np.uint8)
    batch = reader.RecordBatch(
        codes, np.full(512, 101, np.int32),
        np.zeros(512, np.int64), codes)
    sel = sieve.candidates(batch)
    assert sel is not None and len(sel) <= 5   # ~0 chance passes


def test_sieve_t1_regime():
    ''' configs where only one seed is guaranteed (t == 1) still verify
        via stage 3 and never drop a hitting read '''
    sieve = KmerSieve.build(['ACGTACGTACGTA'], maxerrors=1,
                            minoverlap=12, minreadlength=12)
    assert sieve is not None
    assert sieve.t == 1   # m=12, k=6: 12-6+1-6 = 1

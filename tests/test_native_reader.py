'''
Native C++ FastQ pipeline (csrc/reader.cpp): byte-equality with the numpy
pipeline on all fixtures (plain + gz + paired), error parity, stats parity.
'''

import glob
import gzip
import os

import numpy as np
import pytest

from kvarq_tpu.engine import reader, native

HERE = os.path.abspath(os.path.dirname(__file__))
FASTQS = os.path.join(HERE, 'fastqs')

pytestmark = pytest.mark.skipif(
    not native.available(), reason='native reader unavailable')


def both(fnames, Amin=ord('!'), minreadlength=3, batchsize=64):
    s1, s2 = reader.ReaderStats(), reader.ReaderStats()
    b1 = list(native.batches(fnames, Amin, minreadlength, s1, batchsize))
    os.environ['KVARQ_NATIVE'] = '0'
    try:
        b2 = list(reader.batches(fnames, Amin, minreadlength, s2, batchsize))
    finally:
        os.environ.pop('KVARQ_NATIVE')
    return (b1, s1), (b2, s2)


def assert_equal_batches(b1, b2):
    assert len(b1) == len(b2)
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x.rl, y.rl)
        np.testing.assert_array_equal(x.filepos, y.filepos)
        np.testing.assert_array_equal(x.codes, y.codes)
        np.testing.assert_array_equal(x.raw, y.raw)


@pytest.mark.parametrize('fname,Amin', [
    ('test_engine.fastq', ord('!')),
    ('test_engine.fastq', ord('*')),
    ('test_engine.fastq.gz', ord('!')),
    ('test_analyser.fastq', ord('!')),
    ('L3_N1014_hits_5k.fastq', 33 + 13),
    ('N0116_1_hits_1k.fastq', 33 + 13),
])
def test_parity(fname, Amin):
    path = os.path.join(FASTQS, fname)
    (b1, s1), (b2, s2) = both([path], Amin=Amin)
    assert_equal_batches(b1, b2)
    assert s1.records_parsed == s2.records_parsed
    assert s1.rls_longest == s2.rls_longest
    np.testing.assert_array_equal(s1.rls, s2.rls)


def test_multi_file():
    f1 = os.path.join(FASTQS, 'test_engine_1.fastq')
    f2 = os.path.join(FASTQS, 'test_engine_2.fastq')
    (b1, s1), (b2, s2) = both([f1, f2])
    assert_equal_batches(b1, b2)
    assert s1.records_parsed == s2.records_parsed


def test_error_parity(tmp_path):
    bad = tmp_path / 'bad.fastq'
    bad.write_text('@r1\nACGT\nXIIII\nIIII\n')
    with pytest.raises(reader.FastqFormatError) as e1:
        list(native.batches([str(bad)], ord('!'), 1,
                            reader.ReaderStats(), 16))
    os.environ['KVARQ_NATIVE'] = '0'
    try:
        with pytest.raises(reader.FastqFormatError) as e2:
            list(reader.batches([str(bad)], ord('!'), 1,
                                reader.ReaderStats(), 16))
    finally:
        os.environ.pop('KVARQ_NATIVE')
    assert str(e1.value) == str(e2.value)

    bad2 = tmp_path / 'bad2.fastq'
    bad2.write_text('r1\nACGT\n+\nIIII\n')
    with pytest.raises(reader.FastqFormatError) as e3:
        list(native.batches([str(bad2)], ord('!'), 1,
                            reader.ReaderStats(), 16))
    assert "start with '@'" in str(e3.value)


def test_multistream_gz(tmp_path):
    ''' concatenated gz members must decompress as one stream
        (workhorse.c:841-866) '''
    rec = b'@r\nACGTACGT\n+\nIIIIIIII\n'
    p = tmp_path / 'multi.fastq.gz'
    with open(p, 'wb') as f:
        f.write(gzip.compress(rec * 3))
        f.write(gzip.compress(rec * 2))
    (b1, s1), (b2, s2) = both([str(p)])
    assert s1.records_parsed == 5
    assert_equal_batches(b1, b2)


def test_sieve_parity():
    ''' native C sieve (rolling k-mer filter inside kvq_next) keeps exactly
        the reads the numpy KmerSieve keeps, with identical stats '''
    from kvarq_tpu.engine.sieve import KmerSieve
    path = os.path.join(FASTQS, 'L3_N1014_hits_5k.fastq')
    # templates that really occur in the fixture plus a decoy
    seqs = [
        'GAGCATGTGGAGCAACTTGTGGGAGCGCCGGGCAACGCCCTGTCTCTTAT',
        'TTGACCGATGACCCCGGTTCAGGCTTCACCACAGTGTGGAACGCGGTCG',
    ]
    sieve = KmerSieve.build(seqs, 2, 25, 25)
    assert sieve is not None

    def run(sv):
        s1, s2 = reader.ReaderStats(), reader.ReaderStats()
        b1 = list(native.batches([path], 33 + 13, 25, s1, 64, sieve=sv))
        os.environ['KVARQ_NATIVE'] = '0'
        try:
            b2 = list(reader.batches([path], 33 + 13, 25, s2, 64, sieve=sv))
        finally:
            os.environ.pop('KVARQ_NATIVE')
        return (b1, s1), (b2, s2)

    (b1, s1), (b2, s2) = run(sieve)
    # stats count every parsed record regardless of the sieve
    assert s1.records_parsed == s2.records_parsed > 0
    np.testing.assert_array_equal(s1.rls, s2.rls)
    # same candidate reads survive (batch boundaries may differ)
    def flat(bs, field):
        return np.concatenate([getattr(b, field) for b in bs]) \
            if bs else np.zeros(0)
    np.testing.assert_array_equal(flat(b1, 'filepos'), flat(b2, 'filepos'))
    np.testing.assert_array_equal(flat(b1, 'rl'), flat(b2, 'rl'))
    # and the sieve actually dropped something on this fixture
    assert flat(b1, 'rl').size < s1.records_parsed


@pytest.mark.parametrize('nthreads', [2, 4])
def test_threaded_parity(nthreads):
    ''' the threaded native pipeline (worker fan-out over the shared
        stream, csrc/reader.cpp) must produce byte-identical batches and
        stats to the single-threaded one, in the same order '''
    from kvarq_tpu.engine.sieve import KmerSieve
    path = os.path.join(FASTQS, 'L3_N1014_hits_5k.fastq')
    for sieve in (None, KmerSieve.build(
            ['GAGCATGTGGAGCAACTTGTGGGAGCGCCGGGCAACGCCCTGTCTCTTAT'],
            2, 25, 25)):
        s1, s2 = reader.ReaderStats(), reader.ReaderStats()
        b1 = list(native.batches([path], 33 + 13, 25, s1, 64,
                                 sieve=sieve, nthreads=1))
        b2 = list(native.batches([path], 33 + 13, 25, s2, 64,
                                 sieve=sieve, nthreads=nthreads))
        assert_equal_batches(b1, b2)
        assert s1.records_parsed == s2.records_parsed
        assert s1.rls_longest == s2.rls_longest
        np.testing.assert_array_equal(s1.rls, s2.rls)


def test_threaded_gz_multifile():
    fnames = [os.path.join(FASTQS, 'test_engine_1.fastq.gz'),
              os.path.join(FASTQS, 'test_engine_2.fastq.gz')]
    s1, s2 = reader.ReaderStats(), reader.ReaderStats()
    b1 = list(native.batches(fnames, ord('!'), 3, s1, 8, nthreads=1))
    b2 = list(native.batches(fnames, ord('!'), 3, s2, 8, nthreads=3))
    assert_equal_batches(b1, b2)
    assert s1.records_parsed == s2.records_parsed


def test_threaded_error_parity(tmp_path):
    bad = tmp_path / 'bad.fastq'
    # one good record, then a malformed one
    bad.write_text('@r1\nACGT\n+\nIIII\n@r2\nACGT\nXIII\nIIII\n')
    with pytest.raises(reader.FastqFormatError) as e1:
        list(native.batches([str(bad)], ord('!'), 1,
                            reader.ReaderStats(), 16, nthreads=1))
    with pytest.raises(reader.FastqFormatError) as e2:
        list(native.batches([str(bad)], ord('!'), 1,
                            reader.ReaderStats(), 16, nthreads=2))
    assert str(e1.value) == str(e2.value)

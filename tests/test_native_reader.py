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


def write_bgzf(path, payload, block=8192):
    ''' minimal BGZF writer: each <=64 KB chunk becomes an independent
        gzip member whose total compressed size is recorded in the BC
        extra subfield (the bgzip/htslib on-disk format), plus the
        28-byte empty EOF block '''
    import struct
    import zlib

    def member(chunk):
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = 12 + 6 + len(cdata) + 8   # header+extra+deflate+trailer
        hdr = struct.pack('<BBBBIBBH', 0x1f, 0x8b, 8, 4, 0, 0, 0xff, 6)
        extra = struct.pack('<BBHH', ord('B'), ord('C'), 2, bsize - 1)
        trailer = struct.pack('<II', zlib.crc32(chunk) & 0xffffffff,
                              len(chunk))
        return hdr + extra + cdata + trailer

    with open(path, 'wb') as f:
        for lo in range(0, len(payload), block):
            f.write(member(payload[lo:lo + block]))
        f.write(member(b''))   # bgzf EOF marker


def test_bgzf_parallel_decode(tmp_path):
    ''' a BGZF file (block-compressed gzip) takes the parallel per-block
        decode path and must produce byte-identical batches to the numpy
        pipeline reading the same file through gzip; the exact
        decompressed size is known up front (stats.total) '''
    recs = b''.join(b'@r%d\nACGTACGTACGTAAAA\n+\nIIIIIIIIIIIIIIII\n' % i
                    for i in range(5000))
    p = str(tmp_path / 'big.fastq.gz')
    write_bgzf(p, recs, block=4096)

    (b1, s1), (b2, s2) = both([p])
    assert s1.records_parsed == 5000
    assert s1.total == len(recs)   # exact, from the block index
    assert_equal_batches(b1, b2)

    # threaded reader over the bgzf stream stays deterministic
    s3 = reader.ReaderStats()
    b3 = list(native.batches([p], ord('!'), 3, s3, 64, nthreads=4))
    assert_equal_batches(b3, b2)


def test_bgzf_corrupt_block(tmp_path):
    ''' a corrupted BGZF block must never pass silently.  Depending on
        where the flipped byte lands and on pipeline timing, either the
        decompressor reports it (checksum / bad block) or the garbage
        bytes reach the record parser first and surface as a format
        error with a file position -- both are correct refusals, and the
        race is real: decode and parse run concurrently. '''
    recs = b''.join(b'@r%d\nACGTACGT\n+\nIIIIIIII\n' % i
                    for i in range(2000))
    p = str(tmp_path / 'bad.fastq.gz')
    write_bgzf(p, recs, block=4096)
    data = bytearray(open(p, 'rb').read())
    data[len(data) // 2] ^= 0xff   # clobber a mid-file block payload
    with open(p, 'wb') as f:
        f.write(data)
    with pytest.raises(Exception) as e:
        list(native.batches([p], ord('!'), 1, reader.ReaderStats(), 64))
    msg = str(e.value)
    assert ('inflating' in msg or 'bgzf' in msg
            or 'record' in msg or 'line of record' in msg), msg


def test_big_gz_ring_path(tmp_path):
    ''' plain gz above the whole-file background-decode cap streams
        through the dedicated decode thread (ring); forcing the cap to 0
        exercises that path on a small file '''
    recs = b''.join(b'@r%d\nACGTACGTACGTACGT\n+\nIIIIIIIIIIIIIIII\n' % i
                    for i in range(3000))
    p = str(tmp_path / 'ring.fastq.gz')
    with open(p, 'wb') as f:
        f.write(gzip.compress(recs))
    os.environ['KVARQ_GZ_BGCAP'] = '0'
    try:
        (b1, s1), (b2, s2) = both([p])
    finally:
        os.environ.pop('KVARQ_GZ_BGCAP')
    assert s1.records_parsed == 3000
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


def test_long_reads(tmp_path):
    ''' reads longer than the 1024-byte default row stride: the native
        pipeline grows its buffers on demand (kvq_next -2 protocol)
        instead of erroring, with read-stream and stats parity vs numpy
        in every thread mode; with the sieve on, a long all-'N' read
        must neither overflow the per-window buffers (regression) nor
        pass, and a template planted deep inside a 1500 bp read must '''
    from kvarq_tpu.engine.sieve import KmerSieve

    rng = np.random.RandomState(7)
    tmpl = ''.join('ACGT'[i] for i in rng.randint(4, size=51))
    r_bg = ''.join('ACGT'[i] for i in rng.randint(4, size=1500))
    r_hit = r_bg[:700] + tmpl + r_bg[700 + 51:]
    reads = [('r0', 'ACGT' * 20), ('r1', r_bg), ('r2', r_hit),
             ('r3', 'N' * 2000), ('r4', 'ACGT' * 10)]
    path = tmp_path / 'long.fastq'
    with open(path, 'w') as fd:
        for name, seq in reads:
            fd.write('@%s\n%s\n+\n%s\n' % (name, seq, 'I' * len(seq)))

    def flatten(batches):
        return [(int(r), int(p), bytes(raw[:r]))
                for b in batches
                for r, p, raw in zip(b.rl, b.filepos, b.raw)]

    for use_sieve in (False, True):
        sieve = KmerSieve.build([tmpl], 2, 25, 25) if use_sieve else None
        s2 = reader.ReaderStats()
        os.environ['KVARQ_NATIVE'] = '0'
        try:
            want = flatten(reader.batches([str(path)], ord('!'), 25, s2,
                                          4, sieve=sieve))
        finally:
            os.environ.pop('KVARQ_NATIVE')
        for nthreads in (1, 4):
            s1 = reader.ReaderStats()
            got = flatten(native.batches([str(path)], ord('!'), 25, s1,
                                         4, sieve=sieve,
                                         nthreads=nthreads))
            assert got == want, (use_sieve, nthreads)
            assert s1.records_parsed == s2.records_parsed == len(reads)
            assert s1.rls_longest == s2.rls_longest == 2000
            np.testing.assert_array_equal(s1.rls, s2.rls)
        if use_sieve:
            # the planted read passed; the all-N / background ones did not
            assert [r for r, _, _ in want] == [1500]

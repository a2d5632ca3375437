'''
Randomized property test: the native C++ reader and the numpy pipeline
must agree byte-for-byte on generated FastQ files with adversarial shapes
(CRLF, +IDENT separators, low-quality stretches, short reads, trailing
partial records, multi-file streams).
'''

import os

import numpy as np
import pytest

from kvarq_tpu.engine import reader, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason='native reader unavailable')

BASES = b'ACGTN'


def gen_fastq(rng, n, crlf=False, plus_ident=False, trailing=b''):
    out = []
    for i in range(n):
        L = rng.randint(1, 150)
        bases = bytes(rng.choice(np.frombuffer(BASES, np.uint8), L))
        qual = bytes((rng.randint(33, 74, L)).astype(np.uint8))
        eol = b'\r\n' if crlf else b'\n'
        sep = b'+r%d' % i if plus_ident else b'+'
        out += [b'@r%d comment' % i, eol, bases, eol, sep, eol, qual, eol]
    return b''.join(out) + trailing


@pytest.mark.parametrize('crlf,plus_ident,trailing', [
    (False, False, b''),
    (True, False, b''),
    (False, True, b''),
    (True, True, b'@partial\nACGT\n'),   # incomplete trailing record
    (False, False, b'@r999\nACGT\n+\n'),  # missing final quality newline
])
def test_fuzz_parity(tmp_path, crlf, plus_ident, trailing):
    rng = np.random.RandomState(hash((crlf, plus_ident, len(trailing)))
                                % 2 ** 31)
    p = tmp_path / 'f.fastq'
    p.write_bytes(gen_fastq(rng, 200, crlf, plus_ident, trailing))

    for Amin in (33, 50, 60):
        s1, s2 = reader.ReaderStats(), reader.ReaderStats()
        b1 = list(native.batches([str(p)], Amin, 5, s1, 64))
        os.environ['KVARQ_NATIVE'] = '0'
        try:
            b2 = list(reader.batches([str(p)], Amin, 5, s2, 64))
        finally:
            os.environ.pop('KVARQ_NATIVE')
        assert len(b1) == len(b2)
        for x, y in zip(b1, b2):
            np.testing.assert_array_equal(x.rl, y.rl)
            np.testing.assert_array_equal(x.filepos, y.filepos)
            np.testing.assert_array_equal(x.codes, y.codes)
            np.testing.assert_array_equal(x.raw, y.raw)
        assert s1.records_parsed == s2.records_parsed
        np.testing.assert_array_equal(s1.rls, s2.rls)


def test_fuzz_multifile(tmp_path):
    rng = np.random.RandomState(99)
    paths = []
    for i in range(3):
        p = tmp_path / ('f%d.fastq' % i)
        p.write_bytes(gen_fastq(rng, 50))
        paths.append(str(p))

    s1, s2 = reader.ReaderStats(), reader.ReaderStats()
    b1 = list(native.batches(paths, 40, 5, s1, 32))
    os.environ['KVARQ_NATIVE'] = '0'
    try:
        b2 = list(reader.batches(paths, 40, 5, s2, 32))
    finally:
        os.environ.pop('KVARQ_NATIVE')
    assert len(b1) == len(b2)
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x.filepos, y.filepos)
        np.testing.assert_array_equal(x.codes, y.codes)

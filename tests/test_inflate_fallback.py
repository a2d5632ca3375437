'''
The self-contained streaming inflate (csrc/kvq_inflate.h, built with
``-DKVARQ_NO_ZLIB``) must produce byte-identical batches to the
zlib-backed reader on gzip input: all compression levels, stored
blocks, multi-member streams, and gz members with header extra fields.
This is the zero-dependency fallback that gives the rebuild the same
"builds anywhere" property the reference got from vendoring miniz
(reference csrc/gz/miniz.c).
'''

import gzip
import os
import subprocess
import zlib

import numpy as np
import pytest

from kvarq_tpu.engine import native, reader

SRC = os.path.join(os.path.dirname(__file__), '..', 'csrc', 'reader.cpp')


@pytest.fixture(scope='module')
def noz_lib(tmp_path_factory):
    out = str(tmp_path_factory.mktemp('noz') / '_reader_noz.so')
    for cc in ('g++', 'c++'):
        try:
            subprocess.run(
                [cc, '-O2', '-DKVARQ_NO_ZLIB', '-shared', '-fPIC',
                 '-pthread', '-o', out, SRC],
                check=True, capture_output=True)
            return out
        except (OSError, subprocess.CalledProcessError):
            continue
    pytest.skip('no C++ compiler available')


def _drain(libpath, fname):
    saved = (native._lib, native._lib_failed, native.LIB)
    native._lib = None
    native._lib_failed = False
    native.LIB = libpath
    try:
        lib = native.get_lib()
        assert lib is not None
        stats = reader.ReaderStats()
        out = []
        for b in native.batches([fname], 40, 5, stats, batchsize=512,
                                nthreads=2):
            out.append((b.codes.copy(), b.rl.copy(), b.filepos.copy(),
                        b.raw.copy()))
        return stats.records_parsed, out
    finally:
        native._lib, native._lib_failed, native.LIB = saved


def _corpus(tmp_path, n=3000, seed=11):
    rng = np.random.RandomState(seed)
    recs = []
    for i in range(n):
        L = int(rng.randint(5, 150))
        bases = bytes(rng.choice(np.frombuffer(b'ACGTN', np.uint8), L))
        qual = bytes(rng.randint(33, 74, L).astype(np.uint8))
        recs.append(b'@r%d\n%s\n+\n%s\n' % (i, bases, qual))
    data = b''.join(recs)
    plain = str(tmp_path / 'c.fastq')
    with open(plain, 'wb') as f:
        f.write(data)
    return plain, data


def test_fallback_matches_zlib_reader(noz_lib, tmp_path):
    plain, data = _corpus(tmp_path)
    variants = {}
    for lvl in (0, 1, 6, 9):        # 0 = stored blocks
        p = str(tmp_path / ('c%d.fastq.gz' % lvl))
        co = zlib.compressobj(lvl, zlib.DEFLATED, 16 + 15)
        with open(p, 'wb') as f:
            f.write(co.compress(data) + co.flush())
        variants['level%d' % lvl] = p
    # multi-member with FNAME header fields (gzip module sets them)
    p = str(tmp_path / 'mm.fastq.gz')
    with open(p, 'wb') as f:
        n = len(data) // 3
        for k in range(3):
            chunk = data[k * n:] if k == 2 else data[k * n:(k + 1) * n]
            f.write(gzip.compress(chunk, 5))
    variants['multimember'] = p

    nref, ref = _drain(native.LIB, plain)
    assert nref == 3000
    for name, p in variants.items():
        ngot, got = _drain(noz_lib, p)
        assert ngot == nref, name
        assert len(got) == len(ref), name
        for a, b in zip(ref, got):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)


def test_fallback_rejects_corruption(noz_lib, tmp_path):
    plain, data = _corpus(tmp_path, n=500, seed=5)
    p = str(tmp_path / 'bad.fastq.gz')
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
    raw = bytearray(co.compress(data) + co.flush())
    raw[len(raw) // 2] ^= 0xFF
    with open(p, 'wb') as f:
        f.write(bytes(raw))
    with pytest.raises(reader.FastqFormatError):
        _drain(noz_lib, p)

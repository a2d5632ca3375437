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


def test_fuzz_adversarial_combined(tmp_path):
    ''' randomized combination sweep: junk/lowercase bytes inside reads,
        N-rich reads, lengths up to the 1024 histogram cap, CRLF mixes,
        mid-record truncation, every worker-thread count, with and
        without the k-mer sieve -- native and numpy pipelines must agree
        on candidates, lengths, offsets, codes and statistics '''
    import random

    from kvarq_tpu.engine.sieve import KmerSieve

    rng = random.Random(20260820)
    alpha4, alphaN = 'ACGT', 'ACGTN'

    def gen(path, templates, n, crlf_frac, junk_frac):
        with open(path, 'wb') as f:
            for i in range(n):
                if rng.random() < 0.25 and templates:
                    t = rng.choice(templates)
                    L = rng.randint(5, min(400, len(t) + 30))
                    s = (t + ''.join(rng.choice(alpha4)
                                     for _ in range(400)))[:L]
                    s = ''.join(c if rng.random() > 0.03
                                else rng.choice(alpha4) for c in s)
                else:
                    L = rng.choice([5, 8, 25, 51, 101, 150, 301, 1024])
                    a = alphaN if rng.random() < 0.2 else alpha4
                    s = ''.join(rng.choice(a) for _ in range(L))
                if rng.random() < junk_frac:
                    pos = rng.randint(0, len(s) - 1)
                    s = s[:pos] + rng.choice('acgtXY.-') + s[pos + 1:]
                q = ''.join(chr(rng.randint(33, 74))
                            for _ in range(len(s)))
                eol = b'\r\n' if rng.random() < crlf_frac else b'\n'
                sep = b'+' if rng.random() < 0.5 else b'+r%d' % i
                f.write(b'@r%d' % i + eol + s.encode() + eol
                        + sep + eol + q.encode() + eol)

    def run(path, sieve, Amin, mrl, native_on, nthreads):
        os.environ['KVARQ_NATIVE'] = '1' if native_on else '0'
        try:
            stats = reader.ReaderStats()
            fps, rls, codes = [], [], []
            for b in reader.batches([path], Amin, mrl, stats,
                                    batchsize=512, sieve=sieve,
                                    nthreads=nthreads):
                fps.append(b.filepos.copy())
                rls.append(b.rl.copy())
                for i in range(len(b)):
                    codes.append(b.codes[i, :b.rl[i]].tobytes())
        finally:
            os.environ.pop('KVARQ_NATIVE')
        fp = np.concatenate(fps) if fps else np.zeros(0, np.int64)
        rl = np.concatenate(rls) if rls else np.zeros(0, np.int32)
        return fp, rl, codes, stats.records_parsed, tuple(stats.rls)

    for trial in range(12):
        templates = [''.join(rng.choice(alpha4)
                             for _ in range(rng.randint(26, 200)))
                     for _ in range(rng.randint(1, 6))]
        path = str(tmp_path / ('t%d.fastq' % (trial % 2)))
        gen(path, templates, rng.randint(1, 400),
            crlf_frac=rng.choice([0.0, 0.3, 1.0]),
            junk_frac=rng.choice([0.0, 0.05, 0.3]))
        if rng.random() < 0.3:   # truncate mid-record
            data = open(path, 'rb').read()
            open(path, 'wb').write(data[:rng.randint(0, len(data))])
        Amin = rng.choice([33, 43, 53])
        mrl = rng.choice([5, 12, 25])
        me, mo = rng.choice([(0, 12), (1, 20), (2, 25), (3, 30)])
        sieve = KmerSieve.build(templates, me, mo, mrl) \
            if rng.random() < 0.8 else None
        a = run(path, sieve, Amin, mrl, True, rng.choice([1, 2, 8]))
        b = run(path, sieve, Amin, mrl, False, 1)
        assert np.array_equal(a[0], b[0]), trial
        assert np.array_equal(a[1], b[1]), trial
        assert a[2] == b[2] and a[3] == b[3] and a[4] == b[4], trial


def _batches_sig(fnames, nthreads=1, env=None):
    import os
    old = {}
    for k, v in (env or {}).items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        s = reader.ReaderStats()
        sig = []
        for b in native.batches(fnames, 33, 5, s, 64, nthreads=nthreads):
            sig.append((b.codes.tobytes(), b.rl.tobytes(),
                        b.filepos.tobytes(), b.raw.tobytes()))
        return sig, s.records_parsed
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.mark.parametrize('level,members,threads', [
    (1, 1, 1), (9, 1, 2), (6, 3, 2), (0, 1, 1),
])
def test_fuzz_gz_variants(tmp_path, level, members, threads):
    ''' gz input == plain input through the native reader, for every
        compression level / member count, with the fast whole-input
        inflate ON and OFF (zlib ring fallback), single- and
        multi-threaded '''
    import gzip
    rng = np.random.RandomState(level * 100 + members * 10 + threads)
    data = gen_fastq(rng, 400, crlf=(level == 9), trailing=b'')
    plain = tmp_path / 'f.fastq'
    plain.write_bytes(data)
    gz = tmp_path / 'f.fastq.gz'
    per = -(-len(data) // members)
    with open(gz, 'wb') as f:
        for off in range(0, len(data), per):
            f.write(gzip.compress(data[off:off + per],
                                  compresslevel=level))

    ref, nref = _batches_sig([str(plain)], nthreads=threads)
    for fast in ('1', '0'):
        got, ngot = _batches_sig([str(gz)], nthreads=threads,
                                 env={'KVARQ_FAST_INFLATE': fast})
        assert ngot == nref, fast
        assert got == ref, fast


def test_fuzz_gz_truncated_and_corrupt(tmp_path):
    ''' truncated gz ends silently with a prefix; corrupt gz raises a
        FastqFormatError after delivering the valid prefix -- identical
        behavior with the fast inflate on and off '''
    import gzip
    rng = np.random.RandomState(77)
    data = gen_fastq(rng, 800)
    comp = gzip.compress(data, compresslevel=1)

    def run(blob, fast):
        import os
        p = tmp_path / ('x_%s.fastq.gz' % fast)
        p.write_bytes(blob)
        old = os.environ.get('KVARQ_FAST_INFLATE')
        os.environ['KVARQ_FAST_INFLATE'] = fast
        try:
            s = reader.ReaderStats()
            recs, err = [], None
            try:
                for b in native.batches([str(p)], 33, 5, s, 64):
                    recs.append((b.codes.tobytes(), b.rl.tobytes()))
            except reader.FastqFormatError as e:
                err = str(e)
            return recs, s.records_parsed, err
        finally:
            if old is None:
                os.environ.pop('KVARQ_FAST_INFLATE', None)
            else:
                os.environ['KVARQ_FAST_INFLATE'] = old

    for cut in (len(comp) // 3, len(comp) // 2, len(comp) - 5):
        r1 = run(comp[:cut], '1')
        r0 = run(comp[:cut], '0')
        assert r1 == r0, cut
        assert r1[2] is None        # silent truncation, both paths

    bad = bytearray(comp)
    bad[len(bad) // 2] ^= 0x10
    r1 = run(bytes(bad), '1')
    r0 = run(bytes(bad), '0')
    # both must parse the same valid prefix; both should surface an
    # error (the exact zlib message wording may differ)
    assert r1[0] == r0[0]
    assert r1[1] == r0[1]
    assert (r1[2] is None) == (r0[2] is None)


def test_fifo_input(tmp_path):
    ''' FIFO / process-substitution inputs stream correctly: the reader
        must never pre-open the file for size probes or format sniffs
        (a probe open consumes the writer's one-shot connection -- the
        estimate fopen in kvq_open deadlocked this, reproducibly racing
        the writer). Sizes/estimates fall back to unknown. '''
    import threading
    rng = np.random.RandomState(5)
    data = gen_fastq(rng, 300)
    plain = tmp_path / 'x.fastq'
    plain.write_bytes(data)
    fifo = str(tmp_path / 'x.fifo.fastq')
    os.mkfifo(fifo)

    def sig(fname):
        s = reader.ReaderStats()
        out = [(b.codes.tobytes(), b.rl.tobytes())
               for b in native.batches([fname], 33, 5, s, 64)]
        return out, s.records_parsed

    want = sig(str(plain))
    for _ in range(3):                    # the deadlock was a race
        t = threading.Thread(
            target=lambda: open(fifo, 'wb').write(data))
        t.start()
        got = sig(fifo)
        t.join(timeout=30)
        assert not t.is_alive()
        assert got == want

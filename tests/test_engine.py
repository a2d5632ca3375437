'''
Engine conformance tests, ported from the reference test suite
(reference tests/test_engine.py) plus cross-backend equality checks.
All backends must produce byte-identical results.
'''

import gzip
import math
import os.path
import random
import tempfile

import numpy as np
import pytest

from kvarq_tpu import engine
from kvarq_tpu.fastq import Fastq, FastqFileFormatException

HERE = os.path.abspath(os.path.dirname(__file__))
FASTQS = os.path.join(HERE, 'fastqs')
FNAME = os.path.join(FASTQS, 'test_engine.fastq')
FNAME_1 = os.path.join(FASTQS, 'test_engine_1.fastq')
FNAME_2 = os.path.join(FASTQS, 'test_engine_2.fastq')

BACKENDS = ['numpy', 'xla']


def available(backend):
    if backend == 'numpy':
        return True
    try:
        import jax  # noqa: F401
        return True
    except Exception:
        return False


@pytest.fixture(params=BACKENDS)
def backend(request):
    if not available(request.param):
        pytest.skip('backend %s unavailable' % request.param)
    engine.config(backend=request.param)
    yield request.param
    engine.config(backend='auto')


class FastqGenerator:
    ''' generates .fastq files containing given sequences at a given quality
        embedded in random data (re-derived from reference
        tests/test_engine.py:13-114) '''

    def __init__(self, fname, variant='Sanger'):
        self.fname = fname
        self.fd = open(fname, 'w')
        self.i = 0
        props = Fastq.vendor_variants[variant]
        self.dQ = props.dQ
        self.pos_min = props.Qrange[0]
        self.pos_max = props.Qrange[-1]

    def write_record(self, bases, phredstr):
        assert len(bases) == len(phredstr)
        self.fd.write('@GENERATED%010d\n' % self.i)
        self.i += 1
        self.fd.write(bases + '\n+\n' + phredstr + '\n')

    def p2A(self, p):
        Q = int(-10 * math.log(p) / math.log(10))
        return Fastq.ASCII[Q + self.dQ]

    def randseq(self, n):
        return ''.join('ACGT'[random.randint(0, 3)] for _ in range(n))

    def write_seq(self, seq, pmax=.05, left=0, right=0):
        A = Fastq.ASCII
        Aidx = A.index(self.p2A(pmax))
        bases = self.randseq(left) + seq + self.randseq(right)
        phredstr = ''.join(A[random.randint(self.pos_min, Aidx - 1)]
                           for _ in range(left))
        phredstr += ''.join(A[random.randint(Aidx, self.pos_max)]
                            for _ in range(len(seq)))
        phredstr += ''.join(A[random.randint(self.pos_min, Aidx - 1)]
                            for _ in range(right))
        self.write_record(bases, phredstr)

    def cover_seq(self, seq, minoverlap, readlength, pmax=.05,
                  left=10, right=10):
        assert readlength >= minoverlap and len(seq) >= minoverlap
        overlap = random.randint(minoverlap, readlength)
        if overlap > len(seq):
            l = random.randint(0, readlength - len(seq))
            r = readlength - len(seq) - l
            seqx = self.randseq(l) + seq + self.randseq(r)
        else:
            if random.random() < .5:
                seqx = self.randseq(readlength - overlap) + seq[:overlap]
            else:
                seqx = seq[-overlap:] + self.randseq(readlength - overlap)
        assert len(seqx) == readlength
        self.write_seq(seqx, pmax=pmax, left=left, right=right)

    def flush(self):
        self.fd.flush()


SEQS7 = (
    "CCC",       # "CCCC" counted twice
    "TTTT",
    "TATATATA",
    "TGTAG",     # at beginning
    "ATATT",     # at end
    "GAGCATGTGGAGCAACTTGTGGGAGCGCCGGGCAACGCCCTGTCTCTTAT",
    "...NACTTCCTCTCTACTGGTGTCGGCGGTGAAAGAGCTTACGTACTCTTCGAT...",
)


def test_findseqs(backend, gz=False):
    ''' find specified sequences in handwritten .fastq file; every hit's
        bases must equal the template overlap (reference :137-175) '''
    engine.config(maxerrors=0, minoverlap=1000, minreadlength=3, Amin='!')
    fname = FNAME + ('.gz' if gz else '')
    hits = engine.findseqs(fname, SEQS7)['hits']

    f = gzip.GzipFile(fname, 'rb') if gz else open(fname, 'rb')
    x = [0] * len(SEQS7)
    for hit in hits:
        x[hit.seq_nr] += 1
        seq = SEQS7[hit.seq_nr]
        if hit.seq_pos < 0:
            f.seek(hit.file_pos - hit.seq_pos)
            bps = f.read(hit.length).decode()
        else:
            f.seek(hit.file_pos)
            bps = f.read(hit.length).decode()
            seq = seq[hit.seq_pos:hit.seq_pos + hit[3]]
        assert bps == seq

    assert x == [19, 1, 0, 1, 1, 1, 1]


def test_gz(backend):
    test_findseqs(backend, gz=True)
    test_paired(backend, gz=True)


def test_paired(backend, gz=False):
    ''' scanning a multi-file set equals scanning the concatenation
        (reference :184-205) '''
    engine.config(maxerrors=0, minoverlap=1000, minreadlength=3, Amin='!')
    fname = FNAME
    fnames = (FNAME_1, FNAME_2)
    if gz:
        fname += '.gz'
        fnames = (FNAME_1 + '.gz', FNAME_2 + '.gz')

    ret = engine.findseqs(fname, SEQS7)
    ret_12 = engine.findseqs(fnames, SEQS7)
    assert ret == ret_12


def test_maxerror(backend):
    engine.config(minreadlength=25, minoverlap=25, Amin='!')
    seqs = (
        # original: GAGCATGTGGAGCAACTTGTGGGAGCGCCGGGCAACGCCCTGTCTCTTAT
        "CAGCATGTGGAGCAACTTGTGGGAGCGCCGGGCAACGCCCTGTCTCTTAT",  # 1 error
        "CTGCATGTGGAGCAACTTGTGGGAGCGCCGGGCAACGCCCTGTCTCTTAT",  # 2 errors
        "CTCCATGTGGAGCAACTTGTGGGAGCGCCGGGCAACGCCCTGTCTCTTAT",  # 3 errors
    )
    for maxerrors in range(4):
        engine.config(maxerrors=maxerrors)
        hits = engine.findseqs(FNAME, seqs)['hits']
        assert len(hits) == maxerrors


def test_minoverlap(backend):
    seqs = (
        "TCGATGCGATCTGTCAAGTCGGTGGCGGTA...",  # end of sequence + junk
        "TCGATGCGATCTG.CAAGTCGGTGGCGGTA...",  # ... + 1 error
        "...NTGAACGTATCGCCTCGAGGGACTT",       # junk + beginning of sequence
        "...NTGAACGTATCG.CTCGAGGGACTT",       # ... + 1 error
    )
    engine.config(maxerrors=0, minreadlength=25, minoverlap=30, Amin='!')
    hits = engine.findseqs(FNAME, seqs)['hits']
    assert len(hits) == 1 and hits[0].seq_nr == 0 and hits[0].seq_pos < 0

    engine.config(maxerrors=0, minoverlap=25)
    hits = engine.findseqs(FNAME, seqs)['hits']
    assert len(hits) == 2
    for hit in hits:
        assert hit[0] != 3 or hit[2] > 0

    engine.config(maxerrors=1, minoverlap=25)
    hits = engine.findseqs(FNAME, seqs)['hits']
    assert len(hits) == 4


def test_Amin(backend):
    engine.config(maxerrors=2, minoverlap=25)
    seqs = ("GGAG", "CCGAC")
    engine.config(Amin='H', minreadlength=4, maxerrors=0)
    ret = engine.findseqs(FNAME, seqs)
    assert len(ret['hits']) == 1
    assert ret['stats']['readlengths'][5] == 3
    assert ret['stats']['readlengths'][4] == 5

    engine.config(Amin='G')
    ret = engine.findseqs(FNAME, seqs)
    assert len(ret['hits']) == 2


def test_hits_generated(backend):
    ''' randomized property test: n reads covering a random 51-mer produce
        exactly n hits; mutating every 25th base kills all hits
        (reference :274-321) '''
    random.seed(17)
    with tempfile.NamedTemporaryFile(suffix='.fastq', delete=False) as tfn:
        pass
    try:
        fq = FastqGenerator(tfn.name)
        seq = fq.randseq(51)
        minoverlap, readlength, pmax, n = 25, 100, .05, 100
        for _ in range(n):
            fq.cover_seq(seq, minoverlap=minoverlap,
                         readlength=readlength, pmax=pmax)
        fq.flush()

        fastq = Fastq(tfn.name, quiet=True)
        engine.config(
            nthreads=3,
            Amin=fastq.Q2A(fastq.p2Q(pmax)),
            maxerrors=0,
            minreadlength=random.randint(minoverlap, readlength),
            minoverlap=minoverlap)
        ret = engine.findseqs(tfn.name, [seq])
        assert ret['stats']['readlengths'][readlength] == n
        assert len(ret['hits']) == n

        comp = {'A': 'C', 'C': 'G', 'G': 'T', 'T': 'A'}
        seqx = ''.join(b if i % minoverlap else comp[b]
                       for i, b in enumerate(seq))
        ret = engine.findseqs(tfn.name, [seqx])
        assert ret['stats']['readlengths'][readlength] == n
        assert len(ret['hits']) == 0
    finally:
        os.remove(tfn.name)


def test_fastq_malformed(backend):
    with tempfile.NamedTemporaryFile(suffix='.fastq', delete=False) as tfn:
        pass
    try:
        with open(tfn.name, 'w') as f:
            f.write('_IDENTIFIER\n'
                    'ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT\n'
                    '+\n'
                    '#############################################\n')
        with pytest.raises(FastqFileFormatException):
            engine.findseqs(tfn.name, [])

        with open(tfn.name, 'w') as f:
            f.write('@IDENTIFIER\n'
                    'ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT\n'
                    '-\n'
                    '#############################################\n')
        with pytest.raises(FastqFileFormatException):
            engine.findseqs(tfn.name, [])
    finally:
        os.remove(tfn.name)


def test_forward_fastq(backend):
    ''' CRLF line endings and '+IDENT' separators parse identically
        (reference :349-359) '''
    engine.config(Amin='#', nthreads=2, minoverlap=80)
    with tempfile.NamedTemporaryFile(suffix='.fastq', delete=False) as tfn:
        pass
    try:
        for n in [3, 5, 7, 133]:
            for plus in ['+', '+IDENTIFIER']:
                for cr in ['\n', '\r\n']:
                    record = ('@IDENTIFIER' + cr + 'A' * 80 + cr +
                              plus + cr + '#' * 80 + cr)
                    with open(tfn.name, 'wb') as f:
                        f.write((record * n).encode())
                    Fastq(tfn.name, quiet=True)
                    ret = engine.findseqs(tfn.name, ['A' * 80])
                    assert len(ret['hits']) == n
    finally:
        os.remove(tfn.name)


def test_sieve_equivalence():
    ''' results must be identical with the sieve forced on and off '''
    engine.config(backend='numpy', maxerrors=2, minoverlap=25,
                  minreadlength=25, Amin='!')
    seqs = (
        "GAGCATGTGGAGCAACTTGTGGGAGCGCCGGGCAACGCCCTGTCTCTTAT",
        "CTGCATGTGGAGCAACTTGTGGGAGCGCCGGGCAACGCCCTGTCTCTTAT",
        "TTGACCGATGACCCCGGTTCAGGCTTCACCACAGTGTGGAACGCGGTCG",
    )
    engine.config(sieve='off')
    ret_off = engine.findseqs(FNAME, seqs)
    engine.config(sieve='auto')
    ret_on = engine.findseqs(FNAME, seqs)
    assert ret_off == ret_on


def test_backend_equivalence_random():
    ''' all available backends produce identical hit lists on random data '''
    random.seed(99)
    with tempfile.NamedTemporaryFile(suffix='.fastq', delete=False) as tfn:
        pass
    try:
        fq = FastqGenerator(tfn.name)
        seq = fq.randseq(60)
        for _ in range(50):
            fq.cover_seq(seq, minoverlap=20, readlength=80)
        for _ in range(20):
            fq.write_seq(fq.randseq(80))
        fq.flush()

        engine.config(maxerrors=1, minoverlap=20, minreadlength=20,
                      Amin='0', sieve='off')
        results = {}
        for b in BACKENDS:
            if not available(b):
                continue
            engine.config(backend=b)
            results[b] = engine.findseqs(tfn.name, [seq, seq[5:40]])
        engine.config(backend='auto')
        vals = list(results.values())
        for other in vals[1:]:
            assert other == vals[0]
    finally:
        os.remove(tfn.name)

'''
Exact k-mer sieve: a host-side prefilter that discards reads which provably
cannot produce any hit, before they are shipped to the matcher.

Soundness (q-gram lemma / pigeonhole): every hit overlaps a template by at
least ``m = min(minoverlap, minreadlength, min(len(template)))`` bases with
at most ``e = maxerrors`` mismatches (see kvarq_tpu.engine.hitmodel for the
per-mode overlap bounds).  Splitting the overlap into ``e+1`` contiguous
blocks, at least one block of length ``>= floor(m/(e+1))`` is mismatch-free,
i.e. the read shares an exact ``k``-mer (``k = floor(m/(e+1))``) with some
template -- including ``N``-matches, which is why k-mers are encoded base-5
(A C G T N) rather than 2-bit.

A read sharing no ``k``-mer with the template bank is therefore guaranteed
hit-free and can be dropped.  On real targeted-calling workloads (a few kbp
of loci vs. whole-genome reads) this removes >95% of reads and multiplies
end-to-end throughput accordingly.  Results are bit-identical with the
sieve on or off; tests assert this.
'''

import numpy as np

from kvarq_tpu.engine import encode

MIN_USEFUL_K = 6
MAX_K = 12  # 5**12 ~ 244M bitmap entries (~244 MB bool); plenty for k>=12


class KmerSieve:

    def __init__(self, k, bitmap):
        self.k = k
        self.bitmap = bitmap
        self._pow = (5 ** np.arange(k - 1, -1, -1)).astype(np.int64)

    @classmethod
    def build(cls, seqs, maxerrors, minoverlap, minreadlength):
        '''
        :returns: a sieve for the template bank, or None when no useful
            ``k`` exists for the current configuration
        '''
        seqlens = [len(s) for s in seqs if len(s)]
        if not seqlens:
            return None
        m = min(minoverlap, minreadlength, min(seqlens))
        k = m // (maxerrors + 1)
        if k < MIN_USEFUL_K:
            return None
        k = min(k, MAX_K)

        bitmap = np.zeros(5 ** k, dtype=bool)
        pow5 = (5 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        for s in seqs:
            codes = encode.encode_template(s).astype(np.int64)
            if len(codes) < k:
                continue
            win = np.lib.stride_tricks.sliding_window_view(codes, k)
            valid = (win < 5).all(axis=1)
            if valid.any():
                kcodes = (win[valid] * pow5).sum(axis=1)
                bitmap[kcodes] = True
        return cls(k, bitmap)

    def candidates(self, batch):
        '''
        :param batch: :py:class:`kvarq_tpu.engine.reader.RecordBatch`
        :returns: int array of read indices that *may* hit (all others are
            provably hit-free), or None if all reads are candidates
        '''
        codes = batch.codes.astype(np.int64)
        B, L = codes.shape
        if L < self.k:
            return np.arange(B)
        win = np.lib.stride_tricks.sliding_window_view(codes, self.k, axis=1)
        valid = (win < 5).all(axis=2)
        kcodes = (win * self._pow).sum(axis=2)
        member = np.zeros(kcodes.shape, dtype=bool)
        v = valid.nonzero()
        member[v] = self.bitmap[kcodes[v]]
        mask = member.any(axis=1)
        if mask.all():
            return None
        return np.flatnonzero(mask)

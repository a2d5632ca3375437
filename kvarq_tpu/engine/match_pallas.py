'''
Pallas-accelerated hit-list matcher: the fused TPU kernel
(kvarq_tpu.engine.pallas_scan) flags candidate reads (a sound, tight
superset of the hitting reads) in one pass; only those are then run
through the XLA triplet-extraction step, which applies the exact hit
predicate (kvarq_tpu.engine.hitmodel; reference workhorse.c:1107-1174)
-- so the output equals the XlaMatcher's exactly, at a fraction of the
cost when hits are rare, which they are in genome-scale FastQs (a few
kbp of targets vs. megabases of reads).

Used by ``findseqs`` (the ``-H``/``--extract-hits`` path); the coverage
path (``countseqs``) uses the kernel directly.
'''

import numpy as np

from kvarq_tpu.engine import encode
from kvarq_tpu.engine.match_xla import XlaMatcher, _Bank
from kvarq_tpu.engine.reader import RecordBatch


class PallasMatcher:

    MIN_LPAD = 128   # one compiled kernel covers all short-read buckets

    def __init__(self, seqs, maxerrors, minoverlap,
                 sub=16384, TB=None, TQ=None):
        import jax
        from kvarq_tpu.engine import pallas_scan
        self.seqs = list(seqs)
        self.maxerrors = maxerrors
        self.minoverlap = minoverlap
        self.platform = jax.default_backend()
        self.xla = XlaMatcher(seqs, maxerrors, minoverlap)
        self.sub = sub
        self.TB = TB or pallas_scan.DEF_TB
        self.TQ = TQ or pallas_scan.DEF_TQ
        self._ctx = {}

    def _context(self, Lpad):
        if Lpad not in self._ctx:
            import jax
            import jax.numpy as jnp
            from kvarq_tpu.engine import pallas_scan

            bank = _Bank(self.seqs, Lpad, self.minoverlap)
            arrays = pallas_scan.device_arrays(bank, TQ=self.TQ)
            B = self.sub
            Qp = arrays['qmeta'].shape[1]
            nch = pallas_scan.bank_channels(bank.codes)
            kcall = pallas_scan.match_cand_call(
                Lpad, Qp, B, self.maxerrors, self.minoverlap,
                TB=self.TB, TQ=self.TQ,
                interpret=(self.platform == 'cpu'), nch=nch)

            def hit_flags(codes, rl, K, qmeta):
                read_oh = jax.nn.one_hot(codes, nch, dtype=jnp.bfloat16)
                read_flat = read_oh.reshape(B, -1)
                rl2d = jnp.broadcast_to(
                    rl.astype(jnp.int32)[:, None], (B, 128))
                hitpart = kcall(read_flat, rl2d, K, qmeta)
                return jnp.sum(hitpart, axis=0) > 0          # [B]

            self._ctx[Lpad] = (bank, arrays, jax.jit(hit_flags), B)
        return self._ctx[Lpad]

    def match_batch(self, batch):
        B, Lpad = batch.codes.shape
        if Lpad < self.MIN_LPAD:
            codes = np.full((B, self.MIN_LPAD), encode.CODE_READ_JUNK,
                            dtype=np.uint8)
            codes[:, :Lpad] = batch.codes
            batch = RecordBatch(codes, batch.rl, batch.filepos, batch.raw)
            Lpad = self.MIN_LPAD
        bank, arrays, hit_flags, sub = self._context(Lpad)
        if bank.G == 0:
            return np.empty((0, 3), dtype=np.int64)

        hit_idx = []
        for lo_ in range(0, B, sub):
            hi = min(B, lo_ + sub)
            codes, rl = encode.pad_batch(
                batch.codes[lo_:hi], batch.rl[lo_:hi], sub, Lpad)
            flags = np.asarray(hit_flags(codes, rl, **arrays))
            hit_idx.append(np.flatnonzero(flags[:hi - lo_]) + lo_)

        hit_idx = np.concatenate(hit_idx) if hit_idx else \
            np.empty(0, dtype=np.int64)
        if not len(hit_idx):
            return np.empty((0, 3), dtype=np.int64)

        compacted = RecordBatch(
            batch.codes[hit_idx], batch.rl[hit_idx],
            batch.filepos[hit_idx], batch.raw[hit_idx])
        tri = self.xla.match_batch(compacted)
        if len(tri):
            tri[:, 0] = hit_idx[tri[:, 0]]
        return tri

'''
XLA (jit) matcher: the reference C scanner's exhaustive
reads x templates x offsets loop (workhorse.c:1107-1174), recast as one
one-hot correlation on the MXU plus elementwise mode gating on the VPU.

Formulation
-----------
All templates (plus + minus strands) are concatenated into a single *bank*
with ``Lpad`` never-matching gap bases between them (gap >= max read length,
so a read aligned to one template can never touch a neighbor --
kvarq_tpu.engine.hitmodel.clearance).  For every read ``b`` and every bank
position ``q`` the number of matching bases

    matches[b, q] = sum_j onehot(read[b, j]) . onehot(bank[r0 + j]),
    r0 = q - (Lpad - 1)

is one `lax.conv_general_dilated` -- XLA lowers it to MXU matmuls.  Gap
bases one-hot to the zero vector, so ``matches`` counts template bases only,
and the per-template mismatch count over the read/template intersection is
``overlap - matches``.  Mode gating (hitmodel) then selects hit positions;
the sparse passing set is compacted on device with a fixed-size
``jnp.nonzero`` and decoded on host.

Output is bit-identical to the numpy golden matcher for AGCTN reads
(asserted by tests); junk template bytes never match anything, as in C
where they simply mismatch every read base.
'''

import functools

import numpy as np

from kvarq_tpu.log import lo
from kvarq_tpu.engine import encode

MAXHITS = 65536
ELEM_BUDGET = 48 * 1024 * 1024  # cap on B*Q f32 elements per device step


class _Bank:
    ''' concatenated template bank for a given read padding Lpad.

        Gap between templates: with ``minoverlap`` given, the mode gating
        (hitmodel) bounds any *passing* alignment's hang-off past either
        template end by ``rl - minoverlap`` (modes A/B) or ``rl - seql``
        (mode C full containment), so ``Lpad - min(minoverlap, S_left,
        S_right)`` never-matching bases fully isolate neighbors while
        shrinking the bank ~20% vs. the conservative ``Lpad`` clearance.
        Shift columns below the left-hang bound carry no tid and are
        gated out. '''

    def __init__(self, seqs, Lpad, minoverlap=None):
        self.Lpad = Lpad
        self.minoverlap = minoverlap
        codes = []
        tstart = []
        gaps = []
        pos = 0
        prev_S = None
        for s in seqs:
            if minoverlap is not None and minoverlap >= 1:
                clear = min(minoverlap, max(len(s), 1))
                if prev_S is not None:
                    clear = min(clear, max(prev_S, 1))
                gap = max(Lpad - clear, 0)
            else:
                gap = Lpad  # conservative clearance
            prev_S = len(s)
            gaps.append(gap)
            pos += gap
            tstart.append(pos)
            c = encode.encode_template(s)
            codes.append(np.full(gap, encode.CODE_TMPL_JUNK, dtype=np.uint8))
            codes.append(c)
            pos += len(c)
        self.codes = np.concatenate(codes) if codes else \
            np.zeros(0, dtype=np.uint8)
        self.G = len(self.codes)
        self.Q = self.G + Lpad - 1
        self.tstart = tstart

        # per-position maps: template id / shift d / template length; only
        # shifts that can pass the mode gating (d >= -gap) carry a tid, so
        # neighboring templates' ranges stay disjoint
        tid = np.full(self.Q, -1, dtype=np.int32)
        d_of = np.zeros(self.Q, dtype=np.int32)
        seql_of = np.ones(self.Q, dtype=np.int32)
        for t, (bs, gap, s) in enumerate(zip(tstart, gaps, seqs)):
            S = len(s)
            lowest = bs - gap          # leftmost passing read start
            highest = bs + S - 1
            qlo = lowest + (Lpad - 1)
            qhi = highest + (Lpad - 1)
            tid[qlo:qhi + 1] = t
            d_of[qlo:qhi + 1] = np.arange(lowest, highest + 1) - bs
            seql_of[qlo:qhi + 1] = S
        self.tid = tid
        self.d_of = d_of
        self.seql_of = seql_of


@functools.lru_cache(maxsize=None)
def _jit_step(Lpad, Q, maxerrors, minoverlap, maxhits, platform):
    import jax
    import jax.numpy as jnp
    from jax import lax

    acc_dtype = jnp.float32
    in_dtype = jnp.bfloat16 if platform == 'tpu' else jnp.float32

    def step(read_codes, rl, bank_oh, d_of, seql_of, valid_q):
        # one-hot over the 5 matchable channels; junk codes (5/6) one-hot
        # to the zero vector and thus never match
        read_oh = jax.nn.one_hot(read_codes, encode.NBASE,
                                 dtype=in_dtype)            # [B, Lpad, 5]
        read_oh = jnp.transpose(read_oh, (0, 2, 1))         # [B, 5, Lpad]

        matches = lax.conv_general_dilated(
            bank_oh[None],                                  # [1, 5, G]
            read_oh,                                        # [B, 5, Lpad]
            window_strides=(1,),
            padding=[(Lpad - 1, Lpad - 1)],
            dimension_numbers=('NCH', 'OIH', 'NCH'),
            preferred_element_type=acc_dtype,
        )[0]                                                # [B, Q]
        matches = matches.astype(jnp.int32)

        d = d_of[None, :]                                   # [1, Q]
        seql = seql_of[None, :]
        rl_ = rl[:, None].astype(jnp.int32)                 # [B, 1]
        mo = minoverlap

        ov = jnp.minimum(seql, d + rl_) - jnp.maximum(0, d)
        mism = ov - matches

        ab = (rl_ > mo) & (seql > mo)
        i = -d
        wA = ab & (i >= 1) & (i >= rl_ - seql + 1) & (i <= rl_ - mo)
        wB = ab & (d >= 1) & (d >= seql - rl_) & (d <= seql - mo)
        wC = (rl_ > seql) & (d <= 0) & (-d <= rl_ - seql)
        wD = (rl_ <= seql) & (d >= 0) & (d <= seql - rl_)

        # rl_ > 0 masks batch padding rows (real reads always have rl >= 1)
        passing = (valid_q[None, :] & (rl_ > 0) & (wA | wB | wC | wD)
                   & (mism <= maxerrors))

        count = jnp.sum(passing, dtype=jnp.int32)
        (idx,) = jnp.nonzero(passing.ravel(), size=maxhits, fill_value=-1)
        return idx, count

    return jax.jit(step)


class XlaMatcher:

    def __init__(self, seqs, maxerrors, minoverlap):
        import jax
        self.seqs = list(seqs)
        self.maxerrors = maxerrors
        self.minoverlap = minoverlap
        self.platform = jax.default_backend()
        self._banks = {}
        self._fallback = None

    def _bank(self, Lpad):
        if Lpad not in self._banks:
            self._banks[Lpad] = _Bank(self.seqs, Lpad, self.minoverlap)
        return self._banks[Lpad]

    def match_batch(self, batch):
        import jax.numpy as jnp
        import jax

        B, Lpad = batch.codes.shape
        bank = self._bank(Lpad)
        if bank.G == 0:
            return np.empty((0, 3), dtype=np.int64)

        in_dtype = jnp.bfloat16 if self.platform == 'tpu' else jnp.float32
        bank_oh = jax.nn.one_hot(jnp.asarray(bank.codes), encode.NBASE,
                                 dtype=in_dtype).T          # [5, G]
        d_of = jnp.asarray(bank.d_of)
        seql_of = jnp.asarray(bank.seql_of)
        valid_q = jnp.asarray(bank.tid >= 0)

        sub = max(64, min(B, ELEM_BUDGET // max(bank.Q, 1)))
        step = _jit_step(Lpad, bank.Q, self.maxerrors, self.minoverlap,
                         MAXHITS, self.platform)

        out = []
        for lo_ in range(0, B, sub):
            hi = min(B, lo_ + sub)
            codes = batch.codes[lo_:hi]
            rl = batch.rl[lo_:hi]
            if len(codes) < sub:  # pad to the static shape
                pad = sub - len(codes)
                codes = np.concatenate(
                    [codes, np.full((pad, Lpad), encode.CODE_READ_JUNK,
                                    dtype=np.uint8)])
                rl = np.concatenate([rl, np.zeros(pad, dtype=np.int32)])
            idx, count = step(jnp.asarray(codes), jnp.asarray(rl),
                              bank_oh, d_of, seql_of, valid_q)
            count = int(count)
            if count > MAXHITS:
                lo.warning('xla matcher overflow (%d hits in one step); '
                           'falling back to numpy for this sub-batch' % count)
                out.append(self._numpy_fallback(batch, lo_, hi))
                continue
            idx = np.asarray(idx[:count], dtype=np.int64)
            if len(idx):
                b = idx // bank.Q + lo_
                q = idx % bank.Q
                tri = np.stack(
                    [b, bank.tid[q].astype(np.int64), bank.d_of[q]], axis=1)
                out.append(tri)

        if not out:
            return np.empty((0, 3), dtype=np.int64)
        return np.concatenate(out, axis=0)

    def _numpy_fallback(self, batch, lo_, hi):
        from kvarq_tpu.engine.match_numpy import NumpyMatcher
        from kvarq_tpu.engine.reader import RecordBatch
        if self._fallback is None:
            self._fallback = NumpyMatcher(self.seqs, self.maxerrors,
                                          self.minoverlap)
        sub = RecordBatch(batch.codes[lo_:hi], batch.rl[lo_:hi],
                          batch.filepos[lo_:hi], batch.raw[lo_:hi])
        tri = self._fallback.match_batch(sub)
        tri[:, 0] += lo_
        return tri

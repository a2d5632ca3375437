#!/usr/bin/env python
'''
Precompile the flagship scan shapes into ``kvarq_tpu/_precompiled/``.

On relayed TPU attachments a cold jit compile of the scan graph costs
minutes; the shipped precompiled entries make the first-ever ``kvarq
scan`` / ``bench.py`` run start in seconds instead
(kvarq_tpu.jaxutil.ensure_compilation_cache copies them into the user's
cache directory).  This is the TPU-native analogue of the reference
compiling its C engine once at install time
(/root/reference/setup.py:31-35).

Run on a machine with the target TPU attached, then commit the updated
``kvarq_tpu/_precompiled/*-cache`` files:

    python tools/seed_cache.py

Shapes seeded (everything a default MTBC scan compiles):

- the tensorized scan step (fused Pallas candidate kernel + gathered
  exact scoring + coverage fold), MTBC bank, Lpad=128, sub=16384, fuse=1
  -- used by ``kvarq scan`` and ``bench.py`` (engine.countseqs);
- the PallasMatcher candidate-flag graph -- used by ``kvarq scan -H`` /
  ``--extract-hits`` (engine.findseqs).

Cache keys include the jax version, compile options and device kind; a
mismatch (e.g. different TPU generation) makes an entry silently inert.
'''

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

SEED_DIR = os.path.join(ROOT, 'kvarq_tpu', '_precompiled')
os.makedirs(SEED_DIR, exist_ok=True)
os.environ['JAX_COMPILATION_CACHE_DIR'] = SEED_DIR


def main():
    import time

    import bench

    suites = bench.load_mtbc()
    windows = bench.template_windows(suites)

    from kvarq_tpu.analyse import Analyser
    analyser = Analyser()
    coverages = analyser.load_coverages(suites, spacing=analyser.spacing)
    seqs = [c.plus_seq.bases for c in coverages.values()]
    seqs += [c.minus_seq.bases for c in coverages.values()]

    wpath = '/tmp/kvarq_seed_warmup.fastq'
    bench.generate_fastq(wpath, windows, 2048, 101)

    from kvarq_tpu import engine
    engine.config(maxerrors=2, minoverlap=25, minreadlength=25,
                  nthreads=8, Amin=chr(33 + 13))   # CLI defaults

    import jax
    print('seeding %s on %s (jax %s)'
          % (SEED_DIR, jax.devices()[0].device_kind, jax.__version__))

    t0 = time.time()
    ret = engine.countseqs(wpath, seqs)
    print('countseqs graph compiled in %.1fs (%d hits)'
          % (time.time() - t0,
             int(sum(ret['stats']['nseqhits']))))

    t0 = time.time()
    ret = engine.findseqs(wpath, seqs)
    print('findseqs (hit-list) graphs compiled in %.1fs (%d hits)'
          % (time.time() - t0, len(ret['hits'])))

    # candidate-dense warmup: sieved production batches are nearly all
    # candidates, so TensorScanner's adaptive gather_k switches to dense
    # mode on its first dispatch -- seed that executable too, or the
    # first real scan pays its compile mid-run
    bench.PLANT_FRAC = 0.9
    dpath = '/tmp/kvarq_seed_dense.fastq'
    bench.generate_fastq(dpath, windows, 40960, 101)
    t0 = time.time()
    ret = engine.countseqs(dpath, seqs)
    print('dense-mode scan graph compiled in %.1fs (%d hits)'
          % (time.time() - t0, int(sum(ret['stats']['nseqhits']))))

    entries = sorted(os.listdir(SEED_DIR))
    total = sum(os.path.getsize(os.path.join(SEED_DIR, e))
                for e in entries)
    print('%d cache entries, %.1f MB -- commit kvarq_tpu/_precompiled/'
          % (len(entries), total / 1e6))


if __name__ == '__main__':
    main()

#!/usr/bin/env python
'''
Generate ``testsuites/ebola/EBOV76.fasta`` -- a deterministic synthetic
stand-in for the EBOV_1976_KC242801 Zaire ebolavirus genome used by the
``ebola/sierraleone14`` tutorial testsuite (docs/tutorial.md; reference
docs/tutorial.rst:14-143 walks through building the same suite from the
real Gire et al. 2014 alignment, which cannot be redistributed here).

Same approach as ``tools/reconstruct_genome.py`` for the MTBC ancestor:
a deterministic random genome that carries the *ancestral* base at every
SNP position the testsuite defines (the ``SNP`` constructor asserts
this), so the suite loads and scans exactly like one built from the real
sequence.  Length matches KC242801 (18,959 bp).
'''

import os
import sys

import numpy as np

HERE = os.path.abspath(os.path.dirname(__file__))
OUT = os.path.join(HERE, os.pardir, 'testsuites', 'ebola', 'EBOV76.fasta')

LENGTH = 18959

# tutorial table (docs/tutorial.md): position -> ancestral base; the
# suite's derived bases differ from these by construction
ANCESTRAL = {
    800: 'C', 1849: 'T', 6283: 'C', 8928: 'A', 10218: 'G',
    13856: 'A', 15660: 'T', 15963: 'G', 17142: 'T',
}


def make_genome():
    rng = np.random.RandomState(1976)
    bases = np.frombuffer(b'ACGT', dtype=np.uint8)
    genome = bases[rng.randint(4, size=LENGTH)]
    for pos, base in ANCESTRAL.items():
        genome[pos - 1] = ord(base)          # SNP positions are 1-based
    return genome.tobytes().decode()


def main():
    genome = make_genome()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, 'w') as f:
        f.write('>EBOV76 synthetic KC242801 stand-in '
                '(tools/make_ebov76.py, deterministic)\n')
        for i in range(0, len(genome), 70):
            f.write(genome[i:i + 70] + '\n')
    print('wrote %s (%d bp)' % (OUT, len(genome)))


if __name__ == '__main__':
    sys.exit(main())

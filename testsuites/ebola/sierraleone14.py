# Sierra Leone 2014 EBOV sublineage barcode -- the tutorial's worked
# example (docs/tutorial.md "A complete worked example"; reference
# docs/tutorial.rst:14-143), checked in as a runnable suite so the
# multi-suite batch workflow (`kvarq batch -l ebola/sierraleone14 -l
# MTBC ...`) is executable and golden-tested (tests/test_batch_ebola.py).
#
# SNP table: Gire et al (2014), doi 10.1126/science.1259657 -- the nine
# intrahost sublineage markers from the tutorial.  The genome is a
# deterministic synthetic stand-in for EBOV_1976_KC242801 carrying the
# ancestral base at every defined position (tools/make_ebov76.py); the
# real alignment is not redistributable.

VERSION = '0.1'
GENES_COMPATIBILITY = '0.2'

import os

from kvarq.genes import (Genome, Genotype, Reference, SNP, Test,
                         Testsuite)

EBOV76 = Genome(os.path.join(os.path.dirname(__file__), 'EBOV76.fasta'))
gire14 = Reference('Gire et al (2014) doi 10.1126/science.1259657')

SL1, SL2, SL3 = Genotype('SL1'), Genotype('SL2'), Genotype('SL3')

SNPs = [
    Test(SNP(genome=EBOV76, pos=800, orig='C', base='T'), SL2, gire14),
    Test(SNP(genome=EBOV76, pos=1849, orig='T', base='C'), SL1, gire14),
    Test(SNP(genome=EBOV76, pos=6283, orig='C', base='T'), SL1, gire14),
    Test(SNP(genome=EBOV76, pos=8928, orig='A', base='C'), SL2, gire14),
    Test(SNP(genome=EBOV76, pos=10218, orig='G', base='A'), SL3, gire14),
    Test(SNP(genome=EBOV76, pos=13856, orig='A', base='G'), SL1, gire14),
    Test(SNP(genome=EBOV76, pos=15660, orig='T', base='C'), SL1, gire14),
    Test(SNP(genome=EBOV76, pos=15963, orig='G', base='A'), SL2, gire14),
    Test(SNP(genome=EBOV76, pos=17142, orig='T', base='C'), SL2, gire14),
]

sierraleone14 = Testsuite(SNPs, VERSION)

# TSV-driven SNP testsuite example (rewrite of reference
# testsuites/examples/SNPs.py): loads SNP definitions from SNPs.tsv

VERSION = '0.0'
GENES_COMPATIBILITY = '0.0'

import os.path

from kvarq.genes import Genome, Reference, SNP, Test, Testsuite, Genotype


def tsv2SNPs(path, genome, reference):
    tests = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split('\t')
            name = parts[0]
            pos = int(parts[1])
            bases = parts[2].split('/')
            snp = SNP(genome=genome, pos=pos, orig=bases[0], base=bases[1])
            tests.append(Test(snp, Genotype(name), reference))
    return tests


here = os.path.dirname(__file__)
genome_path = os.path.join(here, os.path.pardir, 'MTBC',
                           'MTB_ancestor_reference.bases')
genome = Genome(genome_path, 'MTB ancestor')
ref = Reference('specify reference here')
SNPs = Testsuite(tsv2SNPs(os.path.join(here, 'SNPs.tsv'), genome, ref),
                 VERSION)

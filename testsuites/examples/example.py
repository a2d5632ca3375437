# example testsuite showing how to write a simple SNP/region based
# testsuite for kvarq_tpu (include with '-l' on the command line; see
# docs/testsuites for details) -- rewrite of reference
# testsuites/examples/example.py

# version of this testsuite (minor bumps for compatible changes)
VERSION = '0.1'
# compared against kvarq.genes.COMPATIBILITY when loading
GENES_COMPATIBILITY = '0.0'

import os.path

from kvarq.genes import Genotype, Gene, Test, Testsuite, Reference, SNP, \
        TemplateFromGenome, Genome

# the hypothetical MTB ancestor genome shipped with the MTBC testsuites
MTBC_dir = os.path.join(os.path.dirname(__file__), os.pardir, 'MTBC')
ancestor = Genome(os.path.join(MTBC_dir, 'MTB_ancestor_reference.bases'),
                  'MTB ancestor')

tbdream = Reference('TBDReamDB : see http://tbdreamdb.com/')

# a genotype without a gene simply labels the finding
inhA = Genotype('Isoniazid resistance')
# with a gene attached, mutations are rendered in gene.XposY format
katG = Genotype('Isoniazid resistance',
                Gene(ancestor, 'katG', 2153889, 2156111, plus_strand=False))

# two SNPs at the same position: only the specified mutants are reported
SNP1 = Test(SNP(genome=ancestor, pos=1673432, orig='T', base='A'),
            inhA, tbdream)
SNP2 = Test(SNP(genome=ancestor, pos=1673432, orig='T', base='C'),
            inhA, tbdream)

# a region scanned for arbitrary mutations; aa_pos0 allows (non)synonymous
# classification of codon 427 of the minus-strand gene
katG_codon = Test(TemplateFromGenome(genome=ancestor, start=2155167,
                                     stop=2155169, direction='-',
                                     aa_pos0=(2155167 - 2153889) // 3 + 1),
                  katG, tbdream)

# the module-level testsuite must be named like this file (up to the
# first dash)
example = Testsuite([SNP1, SNP2, katG_codon], VERSION)

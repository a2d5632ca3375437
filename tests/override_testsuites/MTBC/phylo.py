from kvarq.genes import Testsuite, COMPATIBILITY as GENES_COMPATIBILITY

phylo = Testsuite([], version='0.0')

from kvarq.genes import Testsuite, COMPATIBILITY as GENES_COMPATIBILITY

test = Testsuite([], version='1.1')

'''
Compatibility alias: makes kvarq_tpu importable as ``kvarq`` so that
testsuite plugins and scripts written against the reference KvarQ
(``from kvarq.genes import SNP, Test, ...``) run unmodified.

Each submodule here simply re-exports the kvarq_tpu implementation.
'''

from kvarq_tpu import VERSION, DOWNLOAD_URL, DOC_URL  # noqa: F401

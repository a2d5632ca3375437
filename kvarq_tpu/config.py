'''
Default scan configuration (reference kvarq/config.py).

Engine-level settings beyond the reference's: ``backend`` selects the compute
path (``auto``/``numpy``/``xla``/``pallas``) and ``sieve`` toggles the exact
host-side k-mer prefilter (see kvarq_tpu.engine.sieve).
'''

default_config = {
    'quality': 13,
    'errors': 2,
    'minimum overlap': 25,
    'minimum readlength': 25,
    'threads': 8,
    'spacing': 25,
}


def config_params(config, fastq):
    ''' translate a ``default_config``-style dict into engine.config kwargs '''
    return dict(
        nthreads=config['threads'],
        maxerrors=config['errors'],
        minreadlength=config['minimum readlength'],
        minoverlap=config['minimum overlap'],
        Amin=fastq.Q2A(config['quality']),
        Azero=fastq.Azero,
    )

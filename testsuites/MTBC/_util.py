'''
shared helper for the MTBC testsuites: loads the hypothetical MTBC ancestor
genome (reference testsuites/MTBC/_util.py).

The ``MTB_ancestor_reference.bases`` file is reconstructed from fixture data
by tools/reconstruct_genome.py (the reference checkout does not ship it);
regenerate it with ``python tools/reconstruct_genome.py`` if missing.
'''

import os.path

from kvarq.genes import Genome

ancestor_path = os.path.join(os.path.dirname(__file__),
                             'MTB_ancestor_reference.bases')
ancestor = Genome(ancestor_path, 'MTB ancestor')
# win32 GIT checkout can add '\r'
assert ancestor.size == 4411533 or ancestor.size == 4411534

''' alias for kvarq_tpu.genes (same module object) '''
import sys
import kvarq_tpu.genes
sys.modules[__name__] = kvarq_tpu.genes

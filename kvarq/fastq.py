''' alias for kvarq_tpu.fastq (same module object) '''
import sys
import kvarq_tpu.fastq
sys.modules[__name__] = kvarq_tpu.fastq

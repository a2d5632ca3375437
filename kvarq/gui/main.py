''' alias for kvarq_tpu.gui.main (same module object) '''
import sys
import kvarq_tpu.gui.main
sys.modules[__name__] = kvarq_tpu.gui.main

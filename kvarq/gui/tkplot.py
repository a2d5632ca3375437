''' alias for kvarq_tpu.gui.tkplot (same module object) '''
import sys
import kvarq_tpu.gui.tkplot
sys.modules[__name__] = kvarq_tpu.gui.tkplot

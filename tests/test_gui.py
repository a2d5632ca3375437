'''
GUI tests: import-level checks and display-independent logic everywhere;
widget construction only when a display is available.  (The reference's
tests/test_gui.py is an interactive manual checklist; the display-gated
parts here replace it for CI.)
'''

import os

import pytest


def _has_display():
    import tkinter
    try:
        t = tkinter.Tk()
        t.destroy()
        return True
    except Exception:
        return False


def test_imports():
    import kvarq_tpu.gui.util           # noqa: F401
    import kvarq_tpu.gui.settings       # noqa: F401
    import kvarq_tpu.gui.tkplot         # noqa: F401
    import kvarq_tpu.gui.main           # noqa: F401
    import kvarq_tpu.gui.simple         # noqa: F401
    import kvarq_tpu.gui.explorer       # noqa: F401
    # reference-compatible alias package
    import kvarq.gui.main
    import kvarq_tpu.gui.main as m
    assert kvarq.gui.main is m


def test_pair_fastqs():
    ''' _1/_2 pair merging (reference gui/simple.py:166-199) '''
    from kvarq_tpu.gui.simple import pair_fastqs

    # paireds may carry an unused trailing entry, like the reference
    fastqs, paireds = pair_fastqs(['b_2.fastq', 'b_1.fastq', 'a.fastq'])
    assert fastqs == ['a.fastq', 'b_1.fastq']
    assert paireds[:len(fastqs)] == [False, True]

    fastqs, paireds = pair_fastqs(['x_1.fastq', 'y_2.fastq'])
    assert fastqs == ['x_1.fastq', 'y_2.fastq']
    assert paireds[:len(fastqs)] == [False, False]

    fastqs, paireds = pair_fastqs(['c_1.fastq.gz', 'c_2.fastq.gz'])
    assert fastqs == ['c_1.fastq.gz']
    assert paireds[:len(fastqs)] == [True]


def test_histogram_binning():
    ''' HitHistogramDisplay.make_bins without a display '''
    from kvarq_tpu.gui.tkplot import HitHistogramDisplay

    bins, bw = HitHistogramDisplay.make_bins(
        None, [1, 1, 2, 4, 5, 3, 3, 1], indexed=True, bins=4)
    assert bw >= 1
    assert sum(bins) > 0

    bins, bw = HitHistogramDisplay.make_bins(
        None, [3, 1, 4, 1, 5, 9, 2, 6], indexed=False, bins=4)
    assert sum(bins) == 8


@pytest.mark.skipif(not _has_display(), reason='no display')
def test_widgets_construct(tmp_path):
    import tkinter as tk
    from kvarq_tpu.gui.util import ThemedTk
    from kvarq_tpu.gui.settings import Settings
    from kvarq_tpu.config import default_config

    win = ThemedTk(title='test', geometry=(300, 200))
    win.destroy()

    s = Settings(dict(default_config))
    s.show()
    s.win.destroy()

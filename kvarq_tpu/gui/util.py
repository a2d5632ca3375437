'''
GUI support: themed toplevel window, background-job dialog, help opener and
multi-file dialog helper (reference kvarq/gui/util.py).
'''

import os
import sys
import threading
import tkinter as tk
import tkinter.font as tkfont
import tkinter.filedialog as tkfiledialog
import webbrowser

from kvarq_tpu import VERSION
from kvarq_tpu.util import get_help_path, get_root_path


class ThemedTk(tk.Tk):

    def __init__(self, title=None, esc_closes=False, geometry=None):
        ''' :param esc_closes: whether hitting ``<Escape>`` closes the
                window (via the overridable :py:meth:`close` callback)
            :param geometry: tuple ``(width, height)``; each value can be
                pixels, a fraction (0-1 of the screen) or a negative
                difference from the screen dimension
            (reference gui/util.py:14-53) '''
        tk.Tk.__init__(self)
        self.wm_title('KvarQ-TPU %s%s' % (VERSION,
                                          ' -- ' + title if title else ''))

        self.monospace = tkfont.Font(self, family='Courier New',
                                     weight=tkfont.BOLD)
        self.boldfont = tkfont.Font(self, weight='bold')

        if esc_closes:
            self.bind('<Escape>', lambda x: self.close())

        if geometry:
            sw = self.winfo_screenwidth()
            sh = self.winfo_screenheight()
            w, h = geometry
            if w < 0:
                w = sw + w
            elif w < 1:
                w = int(sw * w)
            if h < 0:
                h = sh + h
            elif h < 1:
                h = int(sh * h)
            w = max(200, min(w, sw - 100))
            h = max(200, min(h, sh - 200))
            self.geometry('%dx%d+%d+%d' % (w, h, 50, (sh - h) // 2))

        self.focus_force()

    def close(self, x=None):
        self.destroy()


def open_help(page='index', anchor=None):
    webbrowser.open(get_help_path(page, anchor, need_url=True))


class BackgroundJob(tk.Tk):
    ''' small progress dialog running a callable on a worker thread with a
        cancel button (reference gui/util.py:69-108) '''

    def __init__(self, title):
        tk.Tk.__init__(self)
        self.title(title)
        self.label = tk.Label(self)
        self.label.pack(expand=1, fill='x')
        self.cancel = tk.Button(self, text='cancel', command=self.cancel_cb)
        self.cancel.pack()
        self.geometry('300x150')
        self.resizable(0, 0)

        self.canceled = False   # set when "cancel" is clicked
        self.message = ''       # polled into the label from the GUI thread
        self.data = None        # free-form cross-thread transfer

    def start(self, run, done_cb=None):
        self.thread = threading.Thread(target=run)
        self.thread.start()
        self.done_cb = done_cb
        self.update()

    def update(self):
        if self.thread.is_alive():
            self.label.config(text=self.message)
            self.after(100, self.update)
        else:
            self.thread = None
            self.destroy()
            if self.done_cb:
                self.done_cb()

    def cancel_cb(self, e=None):
        self.canceled = True


def askopenfilename(*a, **b):
    ''' multi-select file dialog returning a list '''
    ret = tkfiledialog.askopenfilename(*a, **b)
    if isinstance(ret, tuple):
        return list(ret)
    if not ret:
        return []
    tmp = tk.Tk()
    tmp.withdraw()
    out = tmp.tk.splitlist(ret)
    tmp.destroy()
    return list(out)

'''
Canvas plot windows (no matplotlib dependency): per-position coverage with
mutation colors and mean±std guides, trimmed-readlength histogram,
hits-per-template histogram, mean-coverage histogram and spoligo bars
(reference kvarq/gui/tkplot.py).
'''

from collections import Counter
from math import log
import tkinter as tk
import tkinter.font as tkfont
import tkinter.messagebox as tkmessagebox

from kvarq_tpu.gui.util import ThemedTk


class IndexableDisplay:
    ''' base canvas: margins, bottom-left coordinate transforms, ticks and
        a mouse-position readout label (reference tkplot.py:10-105) '''

    def __init__(self, parent, data):
        self.frame = tk.Frame(parent)
        self.grid = self.frame.grid
        self.pack = self.frame.pack

        self.canvas = tk.Canvas(self.frame)
        self.canvas.pack(fill='both', expand=1)
        self.canvas.bind('<Configure>', self.update)
        self.canvas.bind('<Motion>', self.motion)

        self.label = tk.Label(self.frame)
        self.label.pack()

        self.margin = [20, 20, 20, 20]  # top right bottom left
        self.config = {
            'ticks': {
                'length': 8,
                'width': 2,
                'font': tkfont.Font(self.canvas, size=10),
            },
        }
        self.data = data

    def is_inside(self, x, y):
        return (x >= self.margin[3] and
                x < self.canvas.winfo_width() - self.margin[1] and
                y >= self.margin[0] and
                y < self.canvas.winfo_height() - self.margin[2])

    def get_index(self, x):
        return len(self.data) * (x - self.margin[3]) // max(self.width(), 1)

    def width(self):
        return self.canvas.winfo_width() - self.margin[1] - self.margin[3]

    def height(self):
        return self.canvas.winfo_height() - self.margin[0] - self.margin[2]

    def create_rectangle(self, x1, y1, w, h, *a, **b):
        self.canvas.create_rectangle(
            self.margin[3] + x1,
            self.canvas.winfo_height() - self.margin[2] - y1,
            self.margin[3] + x1 + w,
            self.canvas.winfo_height() - self.margin[2] - y1 - h, *a, **b)

    def create_line(self, x1, y1, x2, y2, *a, **b):
        self.canvas.create_line(
            self.margin[3] + x1,
            self.canvas.winfo_height() - self.margin[2] - y1,
            self.margin[3] + x2,
            self.canvas.winfo_height() - self.margin[2] - y2, *a, **b)

    def xticks(self, ticks, labels=None):
        if not labels:
            labels = [str(t) for t in ticks]
        w = self.width()
        ch = self.canvas.winfo_height()
        for i, tick in enumerate(ticks):
            x = int(w * (tick + 0.5) / len(self.data))
            self.create_line(x, 0, x, self.config['ticks']['length'],
                             fill='black', width=self.config['ticks']['width'])
            self.canvas.create_text(self.margin[3] + x,
                                    ch - self.margin[2] // 2,
                                    text=labels[i])

    def transform_ylabel(self, number):
        if number > 1e9:
            return '%.2fG' % (number / 1e9)
        if number > 1e6:
            return '%.2fM' % (number / 1e6)
        if number > 1e3:
            return '%.2fk' % (number / 1e3)
        return str(number)

    def yticks(self, ticks, labels=None):
        if not labels:
            labels = [self.transform_ylabel(t) for t in ticks]
        h = self.height()
        ch = self.canvas.winfo_height()
        for i, tick in enumerate(ticks):
            y = h * tick // max(self.data)
            self.create_line(0, y, self.config['ticks']['length'], y,
                             fill='black', width=self.config['ticks']['width'])
            self.canvas.create_text(self.margin[3] // 2,
                                    ch - self.margin[2] - y,
                                    text=labels[i])

    def update(self, e=None):
        pass

    def motion(self, e=None):
        pass


class CoverageDisplay(IndexableDisplay):
    ''' per-position depth bars with colored mutation stacks, red
        region-of-interest borders and dashed mean±std guides
        (reference tkplot.py:108-178) '''

    def __init__(self, parent, pos0, coverage):
        super().__init__(parent, coverage.coverage)
        self.colors = {
            'coverage': 'gray',
            'bases': {'A': 'blue', 'C': 'cyan', 'G': 'green', 'T': 'red',
                      'N': 'black'},
        }
        self.coverage = coverage
        self.pos0 = pos0

    def motion(self, e):
        if not self.is_inside(e.x, e.y):
            self.label.config(text='(mouse outside graph)')
            return
        i = self.get_index(e.x)
        i = max(0, min(i, len(self.coverage.coverage) - 1))
        if self.pos0:
            text = 'pos=' + str(self.pos0 + i - self.coverage.start)
        else:
            text = 'pos=?'
        text += ' coverage=' + str(self.coverage.coverage[i])
        mutations = self.coverage.mutations.get(i)
        if mutations:
            text += ' mutations=' + ', '.join(
                '%dx %s' % (v, k) for k, v in Counter(mutations).items())
        self.label.config(text=text)

    def update(self, e=None):
        self.canvas.delete('all')
        w, h = self.width(), self.height()
        x = self.data
        self.hitheight = min(3., float(h) / max(max(x), 1))
        for i in range(len(x)):
            rx = w * i // len(x)
            rh = int(x[i] * self.hitheight)
            rw = w * (i + 1) // len(x) - rx
            self.create_rectangle(rx, 0, rw, rh,
                                  fill=self.colors['coverage'], outline='')
            for j, b in enumerate(sorted(self.coverage.mutations.get(i, ''))):
                my = int(j * self.hitheight)
                mh = int((j + 1) * self.hitheight) - my
                self.create_rectangle(rx, my, rw, mh,
                                      fill=self.colors['bases'].get(b, 'black'),
                                      outline='')

        for i in (self.coverage.start, self.coverage.stop):
            lx = w * i // len(x)
            self.create_line(lx, 0, lx, h, fill='red', width=2)

        mean = self.coverage.mean(include_margins=False)
        std = self.coverage.std(include_margins=False)
        for j, dash in ((mean - std, (2, 5)), (mean, (5, 3)),
                        (mean + std, (2, 5))):
            ly = int(j * self.hitheight)
            self.create_line(0, ly, w, ly, fill='black', dash=dash)

        self.create_rectangle(0, 0, w, h, fill='', outline='black')


class CoverageWindow:

    def __init__(self, test, coverage):
        if not coverage.coverage or not max(coverage.coverage):
            tkmessagebox.showinfo('cannot show coverage',
                                  'this template has an empty coverage')
            return
        self.win = ThemedTk(title=str(test), esc_closes=True,
                            geometry=(800, 600))
        pos0 = getattr(test.template, 'start', None)
        self.cd = CoverageDisplay(self.win, pos0, coverage)
        self.cd.pack(fill='both', expand=1)


class ReadlengthDisplay(IndexableDisplay):

    def __init__(self, parent, data):
        super().__init__(parent, list(data))
        self.margin[3] = 60

    def motion(self, e):
        if not self.is_inside(e.x, e.y):
            self.label.config(text='(mouse outside graph)')
            return
        i = self.get_index(e.x)
        i = max(0, min(i, len(self.data) - 1))
        self.label.config(text='%d reads with length=%d' % (self.data[i], i))

    def update(self, e=None):
        self.canvas.delete('all')
        w, h = self.width(), self.height()
        x = self.data
        first = last = greatest = None
        for i in range(len(x)):
            if x[i] > 0 and first is None:
                first = i
            if x[i] > 0:
                last = i
            if greatest is None or x[i] > greatest:
                greatest = x[i]
            rx = w * i // len(x)
            rh = int(float(h) * x[i] / max(max(x), 1))
            rw = w * (i + 1) // len(x) - rx
            self.create_rectangle(rx, 0, rw, rh, fill='gray', outline='')

        self.create_line(0, 0, w, 0, fill='black')
        self.create_line(0, 0, 0, h, fill='black')
        self.draw_ticks(first, last, greatest)

    def draw_ticks(self, first, last, greatest):
        self.xticks([first, last, self.data.index(greatest)])
        self.yticks([greatest])


class ReadlengthWindow:

    def __init__(self, readlengths):
        if readlengths and max(readlengths):
            self.win = ThemedTk(title='Length of quality-cut reads',
                                esc_closes=True, geometry=(600, 400))
            self.cd = ReadlengthDisplay(self.win, readlengths)
            self.cd.pack(fill='both', expand=1)
        else:
            tkmessagebox.showinfo('cannot show readlengths', 'no reads found')


class HitHistogramDisplay(IndexableDisplay):

    def __init__(self, parent, data, indexed=False, nbins=15):
        ''' - ``indexed=False``: data contains actual values
            - ``indexed=True``: data[i] = number of occurrences of value i
            (reference tkplot.py:260-330) '''
        nbins += 1
        bins, binwidth = self.make_bins(data, indexed, nbins)
        super().__init__(parent, bins)
        self.binwidth = binwidth
        self.smallest = min(data)
        self.largest = max(data)

    def make_bins(self, data, indexed, bins):
        if indexed:
            bw = len(data) / float(bins)
        else:
            data = sorted(data)
            bw = (data[-1] - data[0]) / float(bins)

        n = int(log(max(bw, 1e-9)) / log(10)) - 1
        binwidth = int(bw / 10 ** n) * 10 ** n if bw > 0 else 1.
        binwidth = max(1., binwidth)

        out = []
        i = bi = x = mx = 0
        while i < len(data):
            if ((not indexed and data[i] > (bi + 1) * binwidth)
                    or (indexed and i > (bi + 1) * binwidth)):
                out.append(x)
                if x > mx:
                    mx = x
                x = 0
                bi += 1
            else:
                x += data[i] if indexed else 1
                i += 1
        if x:
            out.append(x)
        return out, binwidth

    def motion(self, e):
        if not self.is_inside(e.x, e.y):
            self.label.config(text='(mouse outside graph)')
            return
        i = self.get_index(e.x)
        i = max(0, min(i, len(self.data) - 1))
        a, b = self.binwidth * i, self.binwidth * (i + 1) - 1
        if i == 0:
            a = self.smallest
        if i == len(self.data) - 1:
            b = self.largest
        text = '%d templates with %d' % (self.data[i], a)
        if a != b:
            text += '-' + str(b)
        self.label.config(text=text + ' hits')

    def update(self, e=None):
        self.canvas.delete('all')
        w, h = self.width(), self.height()
        x = self.data
        for i in range(len(x)):
            rx = w * i // len(x)
            rh = int(float(h) * x[i] / max(max(x), 1))
            rw = w * (i + 1) // len(x) - rx
            self.create_rectangle(rx, 0, rw, rh, fill='gray', outline='')
        self.create_rectangle(0, 0, w, h, fill='', outline='black')


class HitHistogramWindow:

    def __init__(self, data, indexed=False):
        if data and max(data):
            self.win = ThemedTk(title='Histogram of hits/template',
                                esc_closes=True, geometry=(600, 400))
            self.cd = HitHistogramDisplay(self.win, data, indexed)
            self.cd.pack(fill='both', expand=1)
        else:
            tkmessagebox.showinfo('cannot show hits/template',
                                  'no hits to template found')


class MeanCoverageDisplay(HitHistogramDisplay):

    def motion(self, e):
        if not self.is_inside(e.x, e.y):
            self.label.config(text='(mouse outside graph)')
            return
        i = self.get_index(e.x)
        i = max(0, min(i, len(self.data) - 1))
        self.label.config(text='%d templates with medium coverage %d-%d' % (
            self.data[i], self.binwidth * i, self.binwidth * (i + 1)))


class MeanCoverageWindow:

    def __init__(self, data, indexed=False):
        if data and max(data):
            self.win = ThemedTk(title='Mean coverage of templates',
                                esc_closes=True, geometry=(600, 400))
            self.cd = MeanCoverageDisplay(self.win, data, indexed)
            self.cd.pack(fill='both', expand=1)
        else:
            tkmessagebox.showinfo('cannot show mean coverage',
                                  'no hits to template found')


class SpoligoDisplay(ReadlengthDisplay):

    def __init__(self, parent, data):
        super().__init__(parent, data)
        self.margin[1] = self.margin[3] = 0

    def motion(self, e):
        if not self.is_inside(e.x, e.y):
            self.label.config(text='(mouse outside graph)')
            return
        i = self.get_index(e.x)
        i = max(0, min(i, len(self.data) - 1))
        self.label.config(text='spoligo%d : %d hits' % (i, self.data[i]))

    def draw_ticks(self, *a, **b):
        pass


class SpoligoWindow:

    def __init__(self, spoligos):
        if spoligos and max(spoligos):
            self.win = ThemedTk(title='Hits/spoligo', esc_closes=True,
                                geometry=(600, 400))
            self.cd = SpoligoDisplay(self.win, spoligos)
            self.cd.pack(fill='both', expand=1)
        else:
            tkmessagebox.showinfo('cannot show hits/spoligo',
                                  'no spoligos found')

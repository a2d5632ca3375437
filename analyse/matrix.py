#!/usr/bin/env python
'''
Offline comparison matrices over many result ``.json`` files: lineage
calls vs a reference table, spoligo patterns (analog hits / called /
reference rows), and a template hit-count heatmap.  Wants matplotlib
unless ``-n`` is given.  Capabilities per reference analyse/matrix.py;
organized as one function per subcommand.
'''

import argparse
import json
import os.path
import re
import sys


# --- pure helpers -------------------------------------------------------------

def oct2bin(ostr):
    ''' 15-digit octal(+final binary digit) spoligo code -> 43 bit list '''
    assert len(ostr) == 15
    bits = [int(digit) for digit in '{:042b}'.format(int(ostr[:-1], 8))]
    return bits + [int(ostr[-1] != '0')]


def lineage_equal(lineage, reflineage):
    ''' equal up to a missing sublineage on either side '''
    if lineage == reflineage:
        return True
    main, _, sub = lineage.partition('/')
    refmain, _, refsub = reflineage.partition('/')
    return main == refmain and (not sub or not refsub)


def result_scalar(data, name):
    ''' pull one analysis result out of a (possibly old-format) json:
        version-0 files key results directly (``lineage``), current files
        per testsuite (``MTBC/phylo``); list values are joined '''
    analyses = data['analyses']
    key = name
    if key not in analyses:
        aliases = {'lineage': 'phylo'}
        wanted = (name, aliases.get(name, name))
        for candidate in analyses:
            if candidate.split('/')[-1] in wanted:
                key = candidate
                break
        else:
            raise KeyError('no "%s" analysis in json' % name)
    value = analyses[key]
    return '; '.join(value) if isinstance(value, list) else value


def match_percentage(matches, mismatches):
    return int(100. * matches / (matches + mismatches))


# --- matrix building ------------------------------------------------------------

class MatrixReport:

    ''' collects matrix rows + labels and renders them via matplotlib '''

    def __init__(self, args):
        self.args = args
        self.rows = []
        self.row_labels = []
        self.plt = None
        if not args.nothing:
            from matplotlib import pyplot as plt
            self.plt = plt

    def add(self, row, label):
        self.rows.append(row)
        self.row_labels.append(label)

    def render(self, xlabels):
        if self.plt is None:
            return
        args = self.args
        self.plt.figure(figsize=(float(args.width[0]),
                                 float(args.height[0])),
                        dpi=args.dpi[0])
        fx = float(args.fractionx[0])
        fy = float(args.fractiony[0])
        m = .05
        self.plt.axes([1 - fx + m, 1 - fy + m, fx - 2 * m, fy - 2 * m])
        self.plt.imshow(self.rows, interpolation='nearest')
        self.plt.xticks(range(len(xlabels)), xlabels, rotation='vertical')
        self.plt.yticks(range(len(self.row_labels)), self.row_labels)

    def save(self):
        if self.plt is not None and self.args.output:
            self.plt.savefig(self.args.output[0], dpi=self.args.dpi[0])
            self.plt.close('all')


def cmd_lineage(args, jsons, reference, report):
    calls = {name: result_scalar(data, 'lineage')
             for name, data in jsons.items()}
    known = set(calls.values())
    for name, ref in (reference or {}).items():
        if 'lineage' in ref:
            known.add(ref['lineage'])
    lineages = sorted(known)

    def one_hot(lineage):
        row = [0] * len(lineages)
        row[lineages.index(lineage)] = 1
        return row

    matches = mismatches = 0
    for name, lineage in calls.items():
        report.add(one_hot(lineage), name)
        ref = (reference or {}).get(name, {})
        if 'lineage' in ref:
            report.add(one_hot(ref['lineage']), '*')
            if lineage_equal(lineage, ref['lineage']):
                matches += 1
            else:
                mismatches += 1
                if args.verbose > 1:
                    print('%s : %s instead of %s'
                          % (name, lineage, ref['lineage']))

    report.render(lineages)
    if args.verbose:
        if matches + mismatches:
            print('%d strains -> %d %% matches (%d vs %d)'
                  % (len(calls), match_percentage(matches, mismatches),
                     matches, mismatches))
        else:
            print('%d strains (no reference information)' % len(calls))


def analog_spoligo_hits(data):
    ''' per-spacer hit counts from a json's raw hit lists '''
    analog = [0] * 43
    for key, hits in data.get('hits', {}).items():
        m = re.match(r'^spoligo(\d+)', key)
        if m:
            analog[int(m.group(1))] = len(hits.split(','))
    return analog


def cmd_spoligo(args, jsons, reference, report):
    matches = mismatches = 0
    analogs = {name: analog_spoligo_hits(data)
               for name, data in jsons.items()}
    analog_rows = []
    for name, data in jsons.items():
        ref = (reference or {}).get(name, {})
        if 'spoligo' not in ref:
            continue
        called = oct2bin(result_scalar(data, 'spoligo').split()[0])
        refbits = oct2bin(ref['spoligo'])
        analog_rows.append(analogs[name])
        report.add(analogs[name], name)
        report.add(called, name)
        report.add(refbits, '*')
        for bit, refbit in zip(called, refbits):
            if bit == refbit:
                matches += 1
            else:
                mismatches += 1

    # normalize the analog rows so they share one scale (max over ALL
    # files, referenced or not, like the reference script)
    peak = max((max(row) for row in analogs.values()), default=0)
    for row in analog_rows:
        for j in range(len(row)):
            row[j] /= float(max(peak, 1))

    if not report.rows:
        print('*** no reference data found -> matrix cannot be plotted')
    else:
        report.render([''] * 43)
    if args.verbose and matches + mismatches:
        print('%d strains -> %d %% matches (%d vs %d)'
              % (len(jsons), match_percentage(matches, mismatches),
                 matches, mismatches))


def cmd_hitmap(args, jsons, reference, report):
    wanted = re.compile(args.filter[0])
    templates = sorted(set(
        key for data in jsons.values()
        for key in data.get('hits', {}) if wanted.match(key)))

    for name, data in jsons.items():
        row = [0] * len(templates)
        for key, poss in data.get('hits', {}).items():
            if wanted.match(key):
                row[templates.index(key)] = len(poss.split(','))
        report.add(row, name)
    report.render(templates)


COMMANDS = {
    'lineage': cmd_lineage,
    'spoligo': cmd_spoligo,
    'hitmap': cmd_hitmap,
}


def build_parser():
    parser = argparse.ArgumentParser(
        description='aggregates several .json files and produces matrix '
                    'comparing classification with reference')
    parser.add_argument('-v', '--verbose', action='count', default=0)
    parser.add_argument('-n', '--nothing', action='store_true',
                        help="don't actually output (draw) anything")
    parser.add_argument('-o', '--output', nargs=1,
                        help='output file of produced graphic')
    parser.add_argument('-r', '--reference', nargs=1,
                        help='.json acting as reference; dictionary '
                             'indexed by filename without extension')
    parser.add_argument('-f', '--filter', nargs=1, default=['.*'],
                        help='filter entries in hitmap (python regex)')
    parser.add_argument('-d', '--dpi', nargs=1, default=[150], type=int)
    parser.add_argument('-x', '--width', nargs=1, default=[30])
    parser.add_argument('-y', '--height', nargs=1, default=[20])
    parser.add_argument('-u', '--fractionx', nargs=1, default=[1.])
    parser.add_argument('-w', '--fractiony', nargs=1, default=[.8])
    parser.add_argument('command',
                        choices=['lineage', 'hitmap', 'spoligo',
                                 'resistance'])
    parser.add_argument('json', nargs='+',
                        help='name of .json files to be aggregated')
    return parser


def load_jsons(fnames):
    jsons = {}
    for fname in fnames:
        with open(fname) as fd:
            key = os.path.splitext(os.path.basename(fname))[0]
            jsons[key] = json.load(fd)
            assert jsons[key]['info']['format'] == 'kvarq'
    return jsons


def main(argv=None):
    args = build_parser().parse_args(argv)

    reference = None
    if args.reference:
        with open(args.reference[0]) as fd:
            reference = json.load(fd)

    jsons = load_jsons(args.json)
    handler = COMMANDS.get(args.command)
    if handler is None:
        sys.stderr.write('command "%s" not implemented\n' % args.command)
        return

    report = MatrixReport(args)
    handler(args, jsons, reference, report)
    report.save()


if __name__ == '__main__':
    main()

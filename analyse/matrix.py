#!/usr/bin/env python
'''
Aggregates several ``.json`` result files and produces comparison matrices
(reference analyse/matrix.py): lineage-call matrix vs a reference
dictionary, spoligo pattern rows (analog hits / called pattern /
reference pattern), and a template hit-count heatmap.
'''

import argparse
import json
import os.path
import re
import sys


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


def oct2bin(ostr):
    ''' 15-digit octal+binary spoligo code -> 43 bits
        (reference matrix.py:104-115) '''
    assert len(ostr) == 15
    spol42 = ostr[-1]
    value = int(ostr[:-1], 8)
    ret = [0] if spol42 == '0' else [1]
    for _ in range(42):
        ret = [value % 2] + ret
        value >>= 1
    return ret


def lineage_equal(lineage, reflineage):
    if lineage == reflineage:
        return True
    ls = lineage.partition('/')
    rls = reflineage.partition('/')
    return ls[0] == rls[0] and len(ls[2]) * len(rls[2]) == 0


def main(argv=None):
    args = build_parser().parse_args(argv)

    if not args.nothing:
        from matplotlib import pyplot as plt
    else:
        plt = None

    reference = None
    if args.reference:
        with open(args.reference[0]) as f:
            reference = json.load(f)

    jsons = {}
    for fname in args.json:
        with open(fname) as f:
            key = os.path.splitext(os.path.basename(fname))[0]
            jsons[key] = json.load(f)
            assert jsons[key]['info']['format'] == 'kvarq'

    def plot_matrix(matrix, xlabels, ylabels):
        if args.nothing:
            return
        plt.figure(figsize=(float(args.width[0]), float(args.height[0])),
                   dpi=args.dpi[0])
        fx, fy, m = float(args.fractionx[0]), float(args.fractiony[0]), .05
        ax = plt.axes([1 - fx + m, 1 - fy + m, fx - 2 * m, fy - 2 * m])
        plt.imshow(matrix, interpolation='nearest')
        plt.xticks(range(len(xlabels)), xlabels, rotation='vertical')
        plt.yticks(range(len(ylabels)), ylabels)

    def result_scalar(data, name):
        ''' analyses values may be version-0 scalars (key "lineage") or
            current per-testsuite entries (key "MTBC/phylo"); lists join '''
        analyses = data['analyses']
        aliases = {'lineage': 'phylo'}
        key = name
        if key not in analyses:
            suffixes = (name, aliases.get(name, name))
            for k in analyses:
                if k.split('/')[-1] in suffixes:
                    key = k
                    break
            else:
                raise KeyError('no "%s" analysis in json' % name)
        val = analyses[key]
        if isinstance(val, list):
            val = '; '.join(val)
        return val

    if args.command == 'lineage':
        total = matches = mismatches = 0
        lineages = set()
        for name, data in jsons.items():
            lineages.add(result_scalar(data, 'lineage'))
        if reference:
            for name, data in reference.items():
                if 'lineage' in data:
                    lineages.add(data['lineage'])
        lineages = sorted(lineages)

        def row_from_lineage(lineage):
            row = [0] * len(lineages)
            row[lineages.index(lineage)] = 1
            return row

        matrix = []
        row_labels = []
        for name, data in jsons.items():
            lineage = result_scalar(data, 'lineage')
            row_labels.append(name)
            matrix.append(row_from_lineage(lineage))
            total += 1
            if reference and name in reference \
                    and 'lineage' in reference[name]:
                reflineage = reference[name]['lineage']
                matrix.append(row_from_lineage(reflineage))
                row_labels.append('*')
                if lineage_equal(lineage, reflineage):
                    matches += 1
                else:
                    mismatches += 1
                    if args.verbose > 1:
                        print('%s : %s instead of %s'
                              % (name, lineage, reflineage))

        plot_matrix(matrix, lineages, row_labels)
        if args.verbose:
            if matches + mismatches:
                print('%d strains -> %d %% matches (%d vs %d)' % (
                    total, int(100. * matches / (matches + mismatches)),
                    matches, mismatches))
            else:
                print('%d strains (no reference information)' % total)

    elif args.command == 'spoligo':
        total = matches = mismatches = 0
        anamax = 0
        matrix = []
        row_labels = []
        for name, data in jsons.items():
            code = result_scalar(data, 'spoligo').split()[0]
            spoligo = oct2bin(code)

            analog = [0] * 43
            for x, hits in data.get('hits', {}).items():
                m = re.match(r'^spoligo(\d+)', x)
                if m:
                    v = len(hits.split(','))
                    anamax = max(anamax, v)
                    analog[int(m.group(1))] = v
            total += 1

            if reference and name in reference \
                    and 'spoligo' in reference[name]:
                refspoligo = oct2bin(reference[name]['spoligo'])
                matrix.append(analog)           # row 1: analog hits
                row_labels.append(name)
                matrix.append(spoligo)          # row 2: called pattern
                row_labels.append(name)
                matrix.append(refspoligo)       # row 3: reference
                row_labels.append('*')
                for i, x in enumerate(spoligo):
                    if x == refspoligo[i]:
                        matches += 1
                    else:
                        mismatches += 1

        for i in range(len(matrix) // 3):
            row = matrix[i * 3]
            for j in range(len(row)):
                row[j] /= float(max(anamax, 1))

        if not matrix:
            print('*** no reference data found -> matrix cannot be '
                  'plotted')
        else:
            plot_matrix(matrix, [''] * 43, row_labels)
        if args.verbose and matches + mismatches:
            print('%d strains -> %d %% matches (%d vs %d)' % (
                total, int(100. * matches / (matches + mismatches)),
                matches, mismatches))

    elif args.command == 'hitmap':
        filterre = re.compile(args.filter[0])
        hits = set()
        for name, data in jsons.items():
            for hit in data.get('hits', {}):
                if filterre.match(hit):
                    hits.add(hit)
        hits = sorted(hits)

        matrix = []
        row_labels = []
        for name, data in jsons.items():
            row = [0] * len(hits)
            for hit, poss in data.get('hits', {}).items():
                if filterre.match(hit):
                    row[hits.index(hit)] = len(poss.split(','))
            matrix.append(row)
            row_labels.append(name)
        plot_matrix(matrix, hits, row_labels)

    else:
        sys.stderr.write('command "%s" not implemented\n' % args.command)

    if args.output and not args.nothing:
        plt.savefig(args.output[0], dpi=args.dpi[0])
        plt.close('all')


if __name__ == '__main__':
    main()

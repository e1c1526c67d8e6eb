#!/usr/bin/env python
"""Overlay training-loss curves from several run logs on one plot.

Rebuild of /root/reference/tools/loss_vs_loss.py:38-119 (the second live
plot tool): each positional argument is a training log; the ``json_stats:
{...}`` lines carry the loss series (the log format is an API — see
pps_tpu/utils/logging.py).  Labels default to the reference's
w/o-CRM-vs-w/-CRM comparison but can be overridden with --labels.
Matplotlib is optional; without it the parsed series are printed.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse
import os

from tools.loss_vs_map import get_loss


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('logs', nargs='+', help='training log files')
    parser.add_argument('--labels', nargs='*', default=None,
                        help='one legend label per log')
    parser.add_argument('--output', default=None,
                        help='output png (default: <dir of first log>/'
                             'draw/loss_vs_loss_plot.png)')
    args = parser.parse_args()

    labels = args.labels or ['w/o CRM', 'w/ CRM'][:len(args.logs)]
    while len(labels) < len(args.logs):
        labels.append(os.path.basename(args.logs[len(labels)]))

    series = []
    for log, label in zip(args.logs, labels):
        losses, iters, _ = get_loss(log)
        print('parsed {} ({}): {} loss points'.format(log, label,
                                                      len(losses)))
        series.append((label, iters, losses))

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
    except ImportError:
        print('matplotlib unavailable; skipping plot')
        return

    import itertools
    colors = itertools.cycle(['r', 'g', 'b', 'm', 'c', 'y', 'k'])
    fig, ax = plt.subplots(figsize=(10, 5))
    for (label, iters, losses), color in zip(series, colors):
        if losses:
            ax.plot(iters, losses, color, linewidth=0.5, label=label)
    ax.legend()
    ax.set_xlabel('Iterations')
    ax.set_ylabel('Loss')
    ax.grid(which='both')
    max_iter = max((it[-1] for _, it, l in series if it), default=1)
    ax.set_xlim([0, max_iter])
    fig.set_tight_layout(True)

    out = args.output
    if out is None:
        out_dir = os.path.join(os.path.dirname(args.logs[0]) or '.', 'draw')
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, 'loss_vs_loss_plot.png')
    plt.savefig(out, dpi=100)
    print('wrote', out)


if __name__ == '__main__':
    main()

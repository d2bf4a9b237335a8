"""Two-stream fusion CLI — flag parity with
/root/reference/eval/merge_2stream_prob.py:21-29."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--prob1', default='', type=str)
    parser.add_argument('--prob2', default='', type=str)
    parser.add_argument('--dataset', default='ucf101', type=str)
    parser.add_argument('--mode', default='c', type=str)
    parser.add_argument('--class_ind', default='', type=str,
                        help='path to ClassInd.txt (replaces the reference\'s '
                             'hard-coded beegfs paths)')
    return parser.parse_args()


def main():
    args = parse_args()
    from coclr_tpu.evalsuite.merge import merge_prob, merge_sim

    if args.mode == 'c':
        if not args.class_ind:
            raise SystemExit('--class_ind is required for mode c')
        with open(args.class_ind) as f:
            action_list = [l.strip() for l in f if l.strip()]
        if ',' in action_list[0]:
            action_list = [i.split(',')[-1] for i in action_list]
        merge_prob(args.prob1, args.prob2, action_list,
                   k400_style=args.dataset == 'k400')
    elif args.mode == 's':
        merge_sim(args.prob1, args.prob2, args.dataset)
    else:
        raise SystemExit(f'unknown mode {args.mode!r}')


if __name__ == '__main__':
    main()

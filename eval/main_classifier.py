"""Finetune / linear-probe / retrieval / N-crop test CLI — flag parity with
/root/reference/eval/main_classifier.py:37-77."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coclr_tpu.config import EvalConfig


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--net', default='s3d', type=str)
    parser.add_argument('--model', default='lincls', type=str)
    parser.add_argument('--dataset', default='ucf101', type=str)
    parser.add_argument('--which_split', default=1, type=int)
    parser.add_argument('--seq_len', default=32, type=int)
    parser.add_argument('--num_seq', default=1, type=int)
    parser.add_argument('--num_fc', default=1, type=int)
    parser.add_argument('--ds', default=1, type=int)
    parser.add_argument('--batch_size', default=32, type=int)
    parser.add_argument('--optim', default='adam', type=str)
    parser.add_argument('--lr', default=1e-3, type=float)
    parser.add_argument('--schedule', default=[60, 80], nargs='*', type=int)
    parser.add_argument('--wd', default=1e-3, type=float)
    parser.add_argument('--dropout', default=0.9, type=float)
    parser.add_argument('--epochs', default=10, type=int)
    parser.add_argument('--start_epoch', default=0, type=int)
    parser.add_argument('--gpu', default=None, type=str)
    parser.add_argument('--train_what', default='last', type=str)
    parser.add_argument('--img_dim', default=128, type=int)
    parser.add_argument('--print_freq', default=5, type=int)
    parser.add_argument('--eval_freq', default=1, type=int)
    parser.add_argument('--reset_lr', action='store_true')
    parser.add_argument('--prefix', default='linclr', type=str)
    parser.add_argument('-j', '--workers', default=8, type=int)
    parser.add_argument('--cos', action='store_true')
    parser.add_argument('--resume', default='', type=str)
    parser.add_argument('--pretrain', default='', type=str)
    parser.add_argument('--test', default='', type=str)
    parser.add_argument('--retrieval', action='store_true')
    parser.add_argument('--dirname', default=None, type=str)
    parser.add_argument('--center_crop', action='store_true')
    parser.add_argument('--five_crop', action='store_true')
    parser.add_argument('--ten_crop', action='store_true')
    parser.add_argument('--compute_dtype', default='bfloat16', type=str)
    parser.add_argument('--num_devices', default=0, type=int)
    parser.add_argument('--sp_size', default=1, type=int,
                        help='temporal sequence parallelism for the train/'
                             'val steps: clips sharded along T over an sp '
                             'mesh axis (test paths are forward-only and '
                             'run unsharded)')
    parser.add_argument('--sph_size', default=1, type=int,
                        help='spatial sequence parallelism for the train/'
                             'val steps: clip height sharded over an sph '
                             'mesh axis; composes with --sp_size')
    parser.add_argument('--max_windows', default=0, type=int,
                        help='>0: eval datasets decode only the CENTER '
                             'max_windows hop windows per video (halves '
                             'host-decode-bound retrieval/TTA cost; 0 = '
                             'reference protocol, mean over all windows)')
    parser.add_argument('--data_root', default='', type=str)
    parser.add_argument('--worker_mode', default='thread', type=str,
                        choices=['thread', 'process'])
    parser.add_argument('--ckpt_format', default='flax', type=str,
                        choices=['flax', 'orbax'],
                        help='checkpoint backend: single-file flax-msgpack '
                             'or orbax dirs (sharded save, resharding resume)')
    return parser.parse_args()


def cfg_from_args(args) -> EvalConfig:
    return EvalConfig(
        net=args.net, model=args.model, dataset=args.dataset,
        which_split=args.which_split, seq_len=args.seq_len, ds=args.ds,
        batch_size=args.batch_size, lr=args.lr,
        schedule=tuple(args.schedule), wd=args.wd, dropout=args.dropout,
        epochs=args.epochs, start_epoch=args.start_epoch,
        img_dim=args.img_dim, print_freq=args.print_freq, optim=args.optim,
        train_what=args.train_what, workers=args.workers,
        resume=args.resume, pretrain=args.pretrain, test=args.test,
        retrieval=args.retrieval, ten_crop=args.ten_crop,
        center_crop=args.center_crop, five_crop=args.five_crop,
        prefix=args.prefix, compute_dtype=args.compute_dtype,
        num_devices=args.num_devices, sp_size=args.sp_size,
        sph_size=args.sph_size, max_windows=args.max_windows,
        data_root=args.data_root,
        worker_mode=args.worker_mode, ckpt_format=args.ckpt_format)


def main():
    args = parse_args()
    cfg = cfg_from_args(args)

    from coclr_tpu.evalsuite import driver

    if cfg.test:
        from coclr_tpu.data import hostaug
        from coclr_tpu.evalsuite import ncrop, retrieval
        from coclr_tpu.utils.checkpoint import load_checkpoint

        model = driver.build_model(cfg)
        state = driver.init_classifier_state(cfg, model)
        if cfg.retrieval:
            # load raw pretrain checkpoint: encoder_q.0. -> backbone
            state = driver.load_pretrained_backbone(state, cfg.test)
        else:
            ckpt = load_checkpoint(cfg.test, state_template=state)
            state = ckpt["state"]
        out_dir = os.path.dirname(cfg.test)

        if cfg.retrieval:
            policy = hostaug.EvalClipPolicy(img_dim=cfg.img_dim, mode="test",
                                            crop_where=5)
            train_ds = driver.build_eval_dataset(cfg, "train", policy=policy)
            test_ds = driver.build_eval_dataset(cfg, "test", policy=policy)
            cache_dir = os.path.join(out_dir, args.dirname or "feature")
            retrieval.run_retrieval(model, state, cfg, train_ds, test_ds,
                                    cache_dir)
        elif cfg.center_crop or cfg.five_crop or cfg.ten_crop:
            def make_dataset(policy):
                return driver.build_eval_dataset(cfg, "test", policy=policy)

            ncrop.run_ncrop_test(model, state, cfg, make_dataset, out_dir,
                                 os.path.basename(cfg.test))
        else:
            # parity: the reference's test() also rejects --test without a
            # crop-mode flag (/root/reference/eval/main_classifier.py:769)
            raise NotImplementedError
        return

    driver.run_classifier_train(cfg)


if __name__ == '__main__':
    main()

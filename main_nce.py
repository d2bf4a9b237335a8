"""InfoNCE / UberNCE pretraining CLI — flag parity with
/root/reference/main_nce.py:38-93 (obsolete torch-distributed launch flags are
accepted and ignored; TPU-specific knobs are additive)."""

import argparse


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--net', default='s3d', type=str)
    parser.add_argument('--model', default='infonce', type=str)
    parser.add_argument('--dataset', default='ucf101-2clip', type=str)
    parser.add_argument('--seq_len', default=32, type=int,
                        help='number of frames in each video block')
    parser.add_argument('--num_seq', default=2, type=int)
    parser.add_argument('--ds', default=1, type=int,
                        help='frame down sampling rate')
    parser.add_argument('--batch_size', default=32, type=int,
                        help='per-device batch size')
    parser.add_argument('--lr', default=1e-3, type=float)
    parser.add_argument('--schedule', default=[120, 160], nargs='*', type=int)
    parser.add_argument('--wd', default=1e-5, type=float)
    parser.add_argument('--resume', default='', type=str)
    parser.add_argument('--pretrain', default='', type=str)
    parser.add_argument('--test', default='', type=str)
    parser.add_argument('--epochs', default=10, type=int)
    parser.add_argument('--start_epoch', default=0, type=int)
    parser.add_argument('--print_freq', default=5, type=int)
    parser.add_argument('--save_freq', default=1, type=int)
    parser.add_argument('--img_dim', default=128, type=int)
    parser.add_argument('--prefix', default='pretrain', type=str)
    parser.add_argument('--name_prefix', default='', type=str)
    parser.add_argument('-j', '--workers', default=16, type=int)
    parser.add_argument('--seed', default=0, type=int)
    # accepted for reference-CLI compatibility; one process drives all chips
    parser.add_argument('--gpu', default=None)
    parser.add_argument('--world-size', default=-1, type=int)
    parser.add_argument('--rank', default=-1, type=int)
    parser.add_argument('--dist-url', default='env://', type=str)
    parser.add_argument('--dist-backend', default='ici', type=str)
    parser.add_argument('--multiprocessing-distributed', action='store_true')
    parser.add_argument('--local_rank', default=-1, type=int)
    parser.add_argument('--reset_lr', action='store_true')
    # moco
    parser.add_argument('--moco-dim', default=128, type=int)
    parser.add_argument('--moco-k', default=2048, type=int)
    parser.add_argument('--moco-m', default=0.999, type=float)
    parser.add_argument('--moco-t', default=0.07, type=float)
    # TPU-native knobs
    parser.add_argument('--compute_dtype', default='bfloat16', type=str)
    parser.add_argument('--bn_shuffle', default='gather', type=str,
                        choices=['gather', 'alltoall', 'none'])
    parser.add_argument('--aug_backend', default='auto', type=str,
                        choices=['auto', 'pallas', 'xla'])
    parser.add_argument('--aug_order', default='shuffle', type=str,
                        choices=['shuffle', 'fixed'],
                        help='jitter op order: per-clip random (reference semantics) or fixed b->c->s->h')
    parser.add_argument('--num_devices', default=0, type=int)
    parser.add_argument('--dcn_size', default=1, type=int,
                        help='multi-slice data parallelism: slices over DCN')
    parser.add_argument('--sp_size', default=1, type=int,
                        help='temporal sequence parallelism: clips sharded '
                             'along T over an sp mesh axis (all backbones)')
    parser.add_argument('--sph_size', default=1, type=int,
                        help='spatial sequence parallelism: clip height sharded over an sph mesh axis; composes with --sp_size')
    parser.add_argument('--data_root', default='', type=str)
    parser.add_argument('--worker_mode', default='thread', type=str,
                        choices=['thread', 'process'],
                        help='loader workers: thread pool or forked processes'
                             ' with shared-memory staging')
    parser.add_argument('--profile_steps', default=0, type=int,
                        help='capture an XLA device trace of N steady-state '
                             'steps of the first epoch into <exp>/trace')
    parser.add_argument('--ckpt_format', default='flax', type=str,
                        choices=['flax', 'orbax'],
                        help='checkpoint backend: single-file flax-msgpack '
                             'or orbax dirs (sharded save, resharding resume)')
    parser.add_argument('--cos', action='store_true')
    parser.add_argument('--multihost', action='store_true',
                        help='one JAX process per TPU host; rendezvous '
                             'auto-detected on TPU pods')
    parser.add_argument('--coordinator', default='', type=str,
                        help='explicit host:port rendezvous (CPU/GPU '
                             'clusters); use with --num_processes/'
                             '--process_id')
    parser.add_argument('--num_processes', default=0, type=int)
    parser.add_argument('--process_id', default=-1, type=int)
    return parser.parse_args()


def cfg_from_args(args):
    from coclr_tpu.config import PretrainConfig

    return PretrainConfig(
        net=args.net, model=args.model, dataset=args.dataset,
        seq_len=args.seq_len, num_seq=2, ds=args.ds,
        batch_size=args.batch_size, lr=args.lr,
        schedule=tuple(args.schedule), wd=args.wd, epochs=args.epochs,
        start_epoch=args.start_epoch, print_freq=args.print_freq,
        save_freq=args.save_freq, img_dim=args.img_dim, prefix=args.prefix,
        name_prefix=args.name_prefix, workers=args.workers, seed=args.seed,
        resume=args.resume, pretrain=args.pretrain, test=args.test,
        moco_dim=args.moco_dim, moco_k=args.moco_k, moco_m=args.moco_m,
        moco_t=args.moco_t, compute_dtype=args.compute_dtype,
        bn_shuffle=args.bn_shuffle, aug_backend=args.aug_backend,
        aug_order=args.aug_order,
        num_devices=args.num_devices,
        dcn_size=args.dcn_size,
        sp_size=args.sp_size,
        sph_size=args.sph_size,
        data_root=args.data_root, cos=args.cos,
        worker_mode=args.worker_mode, profile_steps=args.profile_steps,
        ckpt_format=args.ckpt_format,
        multihost=args.multihost, coordinator=args.coordinator,
        num_processes=args.num_processes, process_id=args.process_id)


if __name__ == '__main__':
    args = parse_args()
    # jax.distributed.initialize must precede the first backend touch;
    # import the (backend-touching) training stack only afterwards
    from coclr_tpu.parallel.multihost import initialize_from_args
    initialize_from_args(args)
    from coclr_tpu.train.pretrain import run_pretrain
    run_pretrain(cfg_from_args(args))

"""Preprocessing CLI — reference-compatible flags (preproc_mdb.py:200-214).

    python -m phasegen_tpu.cli.preproc --genres Pop [--n_fft 2048 ...]

Extensions: --wav_dir (per-genre WAV directories when medleydb is
unavailable), --out_dir, --seed, --stft {auto,device,host}.
"""

from __future__ import annotations

import argparse

from phasegen_tpu.config import PreprocConfig
from phasegen_tpu.data.preproc import compute_feature


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="select the genre(s) for extracting feature")
    p.add_argument("--n_fft", default=2048, type=int, help="n_fft")
    p.add_argument("--hop_length", default=512, type=int, help="hop_length")
    p.add_argument("--chunk", default=4.064, type=float,
                   help="size of data (in second)")
    p.add_argument("--n_random", default=[30], nargs="+", type=int,
                   help="number of randomly generated clip for each chunk")
    p.add_argument("--unvoice", default=False, action="store_true",
                   help="use unvoice version of tracks")
    p.add_argument("--melody", default=False, action="store_true",
                   help="use melody tracks")
    p.add_argument("--bass", default=False, action="store_true",
                   help="use bass track")
    p.add_argument("--rsr", default=16000, type=int,
                   help="sample rate after being resampled")
    p.add_argument("--n_val", default=1000, type=int,
                   help="number of validation samples")
    p.add_argument("--genres", required=True, type=str,
                   help="genres: comma separate")
    p.add_argument("--get_attr", action="store_true",
                   help="extract the instruments as one-hot vector")
    # extensions
    p.add_argument("--get_gid", action="store_true",
                   help="emit {genre}_gid_{train,val}.npy genre-index "
                        "label shards (reference get_gid mapping)")
    p.add_argument("--wav_dir", default="", type=str,
                   help="fallback: directory with per-genre wav subdirs")
    p.add_argument("--out_dir", default="./output", type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--stft", default="auto",
                   choices=["auto", "device", "host"],
                   help="STFT backend: auto picks the device GEMM-STFT "
                        "except on the D2H-bound axon tunnel, where host "
                        "numpy measured 2x faster (BASELINE.md r3x)")
    p.add_argument("--no_device_stft", action="store_true",
                   help="deprecated alias for --stft host")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = PreprocConfig(
        n_fft=args.n_fft,
        hop_length=args.hop_length,
        chunk=args.chunk,
        n_random=args.n_random,
        unvoice=args.unvoice,
        melody=args.melody,
        bass=args.bass,
        rsr=args.rsr,
        n_val=args.n_val,
        genres=args.genres,
        get_attr=args.get_attr,
        get_gid=args.get_gid,
        wav_dir=args.wav_dir,
        out_dir=args.out_dir,
        seed=args.seed,
        device_stft=(False if (args.no_device_stft or args.stft == "host")
                     else True if args.stft == "device" else None),
    )
    compute_feature(cfg)


if __name__ == "__main__":
    main()

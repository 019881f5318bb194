#!/usr/bin/env python
"""Directory-scale batch transcription: native threaded WAV decode with
one-batch-ahead prefetch (runtime/dataloader.py) feeding the batched
SenseVoice program — audio IO overlaps device compute.

Usage: python examples/batch_transcribe.py <wav_dir_or_files...> [--batch N]
With no args, synthesizes a temp directory of WAVs to demonstrate.

NB: the first batch pays the program's compile/load (slow over a tunneled
TPU; steady batches are ~0.1 s). For deployment cold starts use the AOT
bundle API (runtime/artifact.py, docs/PERF.md "Cold start").
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lele_tpu.runtime.cache import enable_cache  # noqa: E402

enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="*", help="wav files or directories")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--layers", type=int, default=4,
                    help="encoder depth (50 = full SenseVoice-class)")
    args = ap.parse_args()

    paths: list[Path] = []
    for item in args.inputs:
        p = Path(item)
        paths.extend(sorted(p.glob("*.wav")) if p.is_dir() else [p])
    if not paths:
        import tempfile

        from lele_tpu.serving import encode_wav

        td = Path(tempfile.mkdtemp(prefix="lele_batch_"))
        rng = np.random.default_rng(0)
        for i in range(16):
            pcm = (np.sin(np.arange(16000 * 2) / (8 + i)) * 0.3
                   ).astype(np.float32)
            (td / f"utt{i:02d}.wav").write_bytes(encode_wav(pcm, 16000))
        paths = sorted(td.glob("*.wav"))
        print(f"note: no inputs given; synthesized {len(paths)} wavs in {td}")

    from lele_tpu.models import SenseVoiceConfig, SenseVoiceModel
    from lele_tpu.runtime.dataloader import WavBatchLoader

    model = SenseVoiceModel(SenseVoiceConfig(n_layers=args.layers))
    model.init(0)
    loader = WavBatchLoader(paths, batch_size=args.batch)
    t0 = time.perf_counter()
    total_audio = 0.0
    n_done = 0
    for batch in loader:
        from lele_tpu.serving import resample

        # honor each file's actual rate: duration uses it, and the 16 kHz
        # model must not be fed raw 8 k/44.1 k samples
        pcms = []
        for pcm, fsr in batch:
            total_audio += len(pcm) / float(fsr)
            pcms.append(resample(pcm, fsr, 16000) if fsr != 16000 else pcm)
        ids = model.transcribe_batch(pcms)
        for path, out in zip(paths[n_done:], ids):
            print(f"{path.name}: {len(out)} tokens")
        n_done += len(batch)
    dt = time.perf_counter() - t0
    print(f"[STAGE] {n_done} utterances, {total_audio:.1f}s audio in "
          f"{dt:.2f}s → RTF {dt / max(total_audio, 1e-9):.6f} "
          f"(prefetch overlaps IO with device compute)")


if __name__ == "__main__":
    main()

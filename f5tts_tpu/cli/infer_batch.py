"""CSV batch inference driver.

Capability parity with ``infer/infer_cli_batch.py`` and
``infer/infer_batch_parallel.py`` — but actually batched: rows sharing a
reference voice are synthesized through the engine's bucketed batch path
instead of a sequential per-row loop (the reference's "parallel" driver is
sequential, ``infer_batch_parallel.py:33-79``).

CSV columns: ``text`` (required), optional ``prompt_path``, ``prompt_text``,
``language``, ``id``. Outputs ``<out_dir>/[<language>/]<id|row>.wav``.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
from collections import defaultdict

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("f5tpu-infer-batch")
    p.add_argument("--csv", required=True)
    p.add_argument("--out-dir", default="batch_out")
    p.add_argument("--ref-audio", default="", help="default reference wav when csv has no prompt_path")
    p.add_argument("--ref-text", default="", help="default reference transcript")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--fix-duration", type=float, default=None)
    p.add_argument("--config", default=None)
    from f5tts_tpu.cli.infer import add_engine_args

    add_engine_args(p)
    args = p.parse_args(argv)

    from f5tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from f5tts_tpu.audio.io import read_wav, write_wav
    from f5tts_tpu.audio.preprocess import clip_ref_audio, ensure_sentence_punctuation
    from f5tts_tpu.cli.infer import build_engine

    rows = list(csv.DictReader(open(args.csv, encoding="utf-8")))
    if not rows:
        sys.exit("empty csv")

    engine = build_engine(args)
    os.makedirs(args.out_dir, exist_ok=True)

    # group rows by reference voice so each group shares conditioning
    groups: dict[str, list[int]] = defaultdict(list)
    for i, row in enumerate(rows):
        groups[row.get("prompt_path") or args.ref_audio].append(i)

    # chunk rows from co-pending requests (any voice) batch into shared
    # bucketed ODE solves — the per-row engine.synthesize loop would pay one
    # solve per row. Flushed every ~top-bucket rows so a 10k-row corpus never
    # holds every plan and waveform in host memory at once.
    top = engine.cfg.batch_buckets[-1]
    pending: list[tuple[int, object]] = []
    pending_rows = 0

    def flush():
        nonlocal pending, pending_rows
        if not pending:
            return
        all_rows = [r for _, plan in pending for r in plan.rows]
        all_results = engine.synthesize_rows(all_rows)
        pos = 0
        for i, plan in pending:
            k = len(plan.rows)
            wave, sr, _ = engine.finalize_request(plan, all_results[pos : pos + k])
            pos += k
            row = rows[i]
            sub = row.get("language") or ""
            out_dir = os.path.join(args.out_dir, sub) if sub else args.out_dir
            os.makedirs(out_dir, exist_ok=True)
            name = row.get("id") or f"row{i:05d}"
            out = os.path.join(out_dir, f"{name}.wav")
            write_wav(out, wave, sr)
            print(f"wrote {out} ({len(wave)/sr:.2f}s)")
        pending, pending_rows = [], 0

    for ref_path, idxs in groups.items():
        if ref_path:
            ref_audio, ref_sr = read_wav(ref_path)
            ref_audio = clip_ref_audio(ref_audio, ref_sr)
            ref_text = rows[idxs[0]].get("prompt_text") or args.ref_text
        elif args.demo_tiny:
            ref_sr = 24000
            ref_audio = (np.sin(2 * np.pi * 220 * np.arange(ref_sr) / ref_sr) * 0.1).astype(np.float32)
            ref_text = args.ref_text or "reference audio."
        else:
            sys.exit("row missing prompt_path and no --ref-audio given")
        ref_text = ensure_sentence_punctuation(ref_text)

        for i in idxs:
            plan = engine.prepare_request(
                rows[i]["text"], ref_audio, ref_sr, ref_text,
                speed=args.speed, nfe_step=args.nfe or None, cfg_strength=args.cfg_strength,
                seed=args.seed, cross_fade_duration=args.cross_fade,
                fix_duration_secs=args.fix_duration,
            )
            pending.append((i, plan))
            pending_rows += len(plan.rows)
            if pending_rows >= top:
                flush()
    flush()


if __name__ == "__main__":
    main()

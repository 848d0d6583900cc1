"""quality=strict end-to-end at BASE geometry on chip (VERDICT r4 item #6).

Drives the LIVE server (aiohttp, real HTTP) with the sharp toy-trained base
teacher (the same 1500-step field the distillation ladder certifies against,
cached by scripts/distill_certify.py) and probes the per-request escalation
path:

  - a HARD strict request (long text -> near-bucket duration on the sharp
    field) must trip the embedded-estimate threshold and re-solve with the
    exact reference recipe (euler-32);
  - an EASY strict request (short, strongly-conditioned) should stay on the
    fast path if the toy-ladder threshold transfers to base geometry;
  - /v1/metrics must show the escalation counter move.

Writes QUALITY_ESCALATION.json with the observed estimates so the
strict_threshold calibration note in BENCH.md is backed by a live-server
artifact, not only the toy ladder (engine.py:89 strict_threshold=0.12).

Usage (chip):
  python scripts/strict_live_probe.py --teacher .cache_dc1500/teacher.npz
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _post(port, body, timeout=1800):
    req = urllib.request.Request(
        f"http://localhost:{port}/v1/audio/speech",
        data=json.dumps(body).encode(), headers={"content-type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def _get(port, path):
    with urllib.request.urlopen(f"http://localhost:{port}{path}", timeout=30) as r:
        return json.loads(r.read())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default=".cache_dc1500/teacher.npz")
    p.add_argument("--port", type=int, default=7893)
    p.add_argument("--out", default="QUALITY_ESCALATION.json")
    p.add_argument("--hard-chars", type=int, default=420)
    p.add_argument("--easy-chars", type=int, default=40)
    args = p.parse_args()

    work = "/tmp/strict_probe"
    os.makedirs(work, exist_ok=True)

    # vocab sized to DiTConfig.base().text_num_embeds (the server derives
    # text_num_embeds from the vocab file)
    vocab_path = os.path.join(work, "vocab256.txt")
    with open(vocab_path, "w") as f:
        f.write(" \n")
        for c in "abcdefghijklmnopqrstuvwxyz.,?!'-":
            f.write(c + "\n")
        for i in range(256 - 33):
            f.write(f"<tok{i}>\n")

    # random-init vocos weights (escalation concerns the mel solve only)
    voc_path = os.path.join(work, "vocos_rand.npz")
    if not os.path.exists(voc_path):
        import jax

        from f5tts_tpu.models.convert import save_params_npz
        from f5tts_tpu.models.vocos import VocosConfig, init_vocos

        save_params_npz(voc_path, jax.tree.map(
            np.asarray, init_vocos(jax.random.PRNGKey(1), VocosConfig())))

    # harmonic reference voice (the toy field's cond distribution family:
    # quality_harness.build_prompts uses sinusoidal mel structure)
    voice_dir = os.path.join(work, "voices")
    os.makedirs(voice_dir, exist_ok=True)
    wav_path = os.path.join(voice_dir, "default.wav")
    if not os.path.exists(wav_path):
        from f5tts_tpu.audio.io import write_wav

        sr = 24000
        t = np.arange(int(1.4 * sr)) / sr
        w = sum(0.22 * np.sin(2 * np.pi * f0 * t) for f0 in (160.0, 320.0, 480.0))
        write_wav(wav_path, w.astype(np.float32), sr)
    with open(os.path.join(voice_dir, "default.txt"), "w") as f:
        f.write("a reference sentence for the probe.")

    env = {**os.environ,
           "F5TPU_TTS_CKPT": args.teacher, "F5TPU_TTS_VOCAB": vocab_path,
           "F5TPU_VOCODER_CKPT": voc_path, "F5TPU_VOICES_DIR": voice_dir,
           "F5TPU_WARMUP": "0", "F5TPU_SPEECH_RATE_LIMIT": "1000/minute"}
    srv = subprocess.Popen(
        [sys.executable, "-m", "f5tts_tpu.serve.server", "--port", str(args.port)],
        env=env, cwd=REPO, stdout=open(os.path.join(work, "server.log"), "w"),
        stderr=subprocess.STDOUT, start_new_session=True)
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            try:
                h = _get(args.port, "/v1/health")
                if h.get("status") == "healthy":
                    break
            except Exception:
                time.sleep(5)
        else:
            raise RuntimeError("server did not become healthy (see /tmp/strict_probe/server.log)")

        rng = np.random.default_rng(0)
        words = ["the", "hill", "wind", "voice", "stone", "light", "river", "song"]

        def text_of(nchars):
            s = ""
            while len(s) < nchars:
                s += rng.choice(words) + " "
            return s.strip() + "."

        results = {}
        for name, nchars, quality in (
            ("easy_strict", args.easy_chars, "strict"),
            ("hard_strict", args.hard_chars, "strict"),
            ("hard_default", args.hard_chars, "default"),
        ):
            m0 = _get(args.port, "/v1/metrics")
            t0 = time.time()
            wav = _post(args.port, {"text": text_of(nchars), "quality": quality, "seed": 7})
            dt = time.time() - t0
            m1 = _get(args.port, "/v1/metrics")
            results[name] = {
                "latency_s": round(dt, 2), "wav_bytes": len(wav),
                "escalations_delta": (m1.get("quality_escalations", 0)
                                      - m0.get("quality_escalations", 0)),
                "metrics_after": {k: m1[k] for k in ("quality_escalations",)
                                  if k in m1},
            }
            print(f"{name}: {results[name]}", flush=True)

        out = {"teacher": args.teacher, "threshold": 0.12, "rows": results}
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")
    finally:
        os.killpg(os.getpgid(srv.pid), signal.SIGTERM)


if __name__ == "__main__":
    main()

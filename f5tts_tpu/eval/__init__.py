from f5tts_tpu.eval.quality import (  # noqa: F401
    log_mel_mae,
    mcd,
    mel_l2,
    quality_report,
    spectral_convergence,
)

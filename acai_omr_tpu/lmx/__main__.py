"""CLI: linearize / delinearize LMX <-> MusicXML files.

Drop-in replacement for the olimpic submodule invocation the reference shells
out to (reference: vitomr_inference.py:26 ``python -m
olimpic_app.linearization delinearize <lmx> <xml>``):

    python -m acai_omr_tpu.lmx delinearize score.lmx score.musicxml
    python -m acai_omr_tpu.lmx linearize score.musicxml score.lmx

Delinearization problems print to stderr (same contract: non-empty stderr =
minor problems, non-zero exit = catastrophic failure).
"""

import sys
from pathlib import Path


def main():
    if len(sys.argv) != 4 or sys.argv[1] not in ("linearize", "delinearize"):
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    mode, src, dst = sys.argv[1:]
    text = Path(src).read_text()
    if mode == "delinearize":
        from .delinearizer import DelinearizationError, delinearize
        try:
            xml, problems = delinearize(text)
        except DelinearizationError as e:
            print(f"delinearization failed: {e}", file=sys.stderr)
            raise SystemExit(1)
        Path(dst).write_text(xml)
        for p in problems:
            print(p, file=sys.stderr)
    else:
        from .linearizer import linearize
        Path(dst).write_text(linearize(text) + "\n")


if __name__ == "__main__":
    main()

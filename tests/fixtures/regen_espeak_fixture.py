"""Regenerate tests/fixtures/espeak_ipa.json under REAL espeak-ng.

Run on a machine with espeak-ng + phonemizer installed (the nightly CI
environment):

    python tests/fixtures/regen_espeak_fixture.py

Re-records the text -> IPA strings from the live backend and recomputes the
frozen-table ids. Use when an espeak-ng version change legitimately shifts
the phonemization and the nightly fixture test starts failing.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from voicebox_tpu.utils.tokenizer import _IPA_SYMBOLS, EspeakTokenizer  # noqa: E402

FIXTURE = pathlib.Path(__file__).parent / "espeak_ipa.json"


def main():
    data = json.loads(FIXTURE.read_text())
    tok = EspeakTokenizer()  # requires the real backend
    to_id = {s: i for i, s in enumerate(_IPA_SYMBOLS)}
    texts = [e["text"] for e in data["entries"]]
    ipa_strings = tok.backend.phonemize(texts)
    for entry, ipa in zip(data["entries"], ipa_strings):
        ipa = ipa.strip()
        missing = sorted({c for c in ipa if c not in to_id})
        assert not missing, (
            f"espeak emitted symbols outside the frozen table for "
            f"{entry['text']!r}: {missing} — extend _IPA_SYMBOLS (append "
            "ONLY; existing ids must stay stable)"
        )
        entry["ipa"] = ipa
        entry["ids"] = [to_id[c] for c in ipa]
    FIXTURE.write_text(json.dumps(data, ensure_ascii=False, indent=1) + "\n")
    print(f"re-recorded {len(texts)} entries -> {FIXTURE}")


if __name__ == "__main__":
    main()

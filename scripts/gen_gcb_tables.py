"""Generate headson_spark/kernel/_gcb_data.py — compact range tables for
UAX #29 extended grapheme cluster segmentation.

Derived from the Python stdlib `unicodedata` general categories plus the
published UAX #29 / UTS #51 supplements (Grapheme_Cluster_Break property
classes and Extended_Pictographic ranges). Pure public Unicode data.

Run: python scripts/gen_gcb_tables.py  (regenerates the committed table file)
"""

from __future__ import annotations

import sys
import unicodedata

MAX_CP = 0x110000

# --- supplements that unicodedata categories cannot express -----------------

# Other_Grapheme_Extend-ish additions (BMP subset that matters in practice)
EXTEND_EXTRA = [
    (0x200C, 0x200C),  # ZWNJ
    (0xFF9E, 0xFF9F),  # halfwidth voiced sound marks
    (0x09BE, 0x09BE), (0x09D7, 0x09D7), (0x0B3E, 0x0B3E), (0x0B57, 0x0B57),
    (0x0BBE, 0x0BBE), (0x0BD7, 0x0BD7), (0x0CC2, 0x0CC2), (0x0CD5, 0x0CD6),
    (0x0D3E, 0x0D3E), (0x0D57, 0x0D57), (0x0DCF, 0x0DCF), (0x0DDF, 0x0DDF),
    (0x1F3FB, 0x1F3FF),  # emoji skin-tone modifiers (Emoji_Modifier => Extend)
    (0xE0020, 0xE007F),  # tag characters (GCB=Extend)
]

PREPEND = [
    (0x0600, 0x0605), (0x06DD, 0x06DD), (0x070F, 0x070F), (0x0890, 0x0891),
    (0x08E2, 0x08E2), (0x0D4E, 0x0D4E), (0x110BD, 0x110BD),
    (0x110CD, 0x110CD), (0x111C2, 0x111C3), (0x1193F, 0x1193F),
    (0x11941, 0x11941), (0x11A3A, 0x11A3A), (0x11A84, 0x11A89),
    (0x11D46, 0x11D46), (0x11F02, 0x11F02),
]

# Mc codepoints that are Extend/excluded rather than SpacingMark
SPACINGMARK_EXCLUDE = {
    0x102B, 0x102C, 0x1038, 0x1062, 0x1063, 0x1064, 0x1067, 0x1068, 0x1069,
    0x106A, 0x106B, 0x106C, 0x106D, 0x1083, 0x1087, 0x1088, 0x1089, 0x108A,
    0x108B, 0x108C, 0x108F, 0x109A, 0x109B, 0x109C, 0x1A61, 0x1A63, 0x1A64,
    0xAA7B, 0xAA7D, 0x11720, 0x11721,
}
SPACINGMARK_EXTRA = [(0x0E33, 0x0E33), (0x0EB3, 0x0EB3)]

# Extended_Pictographic (UTS #51 emoji-data), Unicode 15 ranges
EXT_PICT = [
    (0x00A9, 0x00A9), (0x00AE, 0x00AE), (0x203C, 0x203C), (0x2049, 0x2049),
    (0x2122, 0x2122), (0x2139, 0x2139), (0x2194, 0x2199), (0x21A9, 0x21AA),
    (0x231A, 0x231B), (0x2328, 0x2328), (0x2388, 0x2388), (0x23CF, 0x23CF),
    (0x23E9, 0x23F3), (0x23F8, 0x23FA), (0x24C2, 0x24C2), (0x25AA, 0x25AB),
    (0x25B6, 0x25B6), (0x25C0, 0x25C0), (0x25FB, 0x25FE), (0x2600, 0x2605),
    (0x2607, 0x2612), (0x2614, 0x2685), (0x2690, 0x2705), (0x2708, 0x2712),
    (0x2714, 0x2714), (0x2716, 0x2716), (0x271D, 0x271D), (0x2721, 0x2721),
    (0x2728, 0x2728), (0x2733, 0x2734), (0x2744, 0x2744), (0x2747, 0x2747),
    (0x274C, 0x274C), (0x274E, 0x274E), (0x2753, 0x2755), (0x2757, 0x2757),
    (0x2763, 0x2767), (0x2795, 0x2797), (0x27A1, 0x27A1), (0x27B0, 0x27B0),
    (0x27BF, 0x27BF), (0x2934, 0x2935), (0x2B05, 0x2B07), (0x2B1B, 0x2B1C),
    (0x2B50, 0x2B50), (0x2B55, 0x2B55), (0x3030, 0x3030), (0x303D, 0x303D),
    (0x3297, 0x3297), (0x3299, 0x3299), (0x1F000, 0x1F0FF),
    (0x1F10D, 0x1F10F), (0x1F12F, 0x1F12F), (0x1F16C, 0x1F171),
    (0x1F17E, 0x1F17F), (0x1F18E, 0x1F18E), (0x1F191, 0x1F19A),
    (0x1F1AD, 0x1F1E5), (0x1F201, 0x1F20F), (0x1F21A, 0x1F21A),
    (0x1F22F, 0x1F22F), (0x1F232, 0x1F23A), (0x1F23C, 0x1F23F),
    (0x1F249, 0x1F3FA), (0x1F400, 0x1F53D), (0x1F546, 0x1F64F),
    (0x1F680, 0x1F6FF), (0x1F774, 0x1F77F), (0x1F7D5, 0x1F7FF),
    (0x1F80C, 0x1F80F), (0x1F848, 0x1F84F), (0x1F85A, 0x1F85F),
    (0x1F888, 0x1F88F), (0x1F8AE, 0x1F8FF), (0x1F90C, 0x1F93A),
    (0x1F93C, 0x1F945), (0x1F947, 0x1FAFF), (0x1FC00, 0x1FFFD),
]

# Hangul syllable ranges
HANGUL_L = [(0x1100, 0x115F), (0xA960, 0xA97C)]
HANGUL_V = [(0x1160, 0x11A7), (0xD7B0, 0xD7C6)]
HANGUL_T = [(0x11A8, 0x11FF), (0xD7CB, 0xD7FB)]

RI = [(0x1F1E6, 0x1F1FF)]
ZWJ = [(0x200D, 0x200D)]


def ranges_from_pred(pred):
    out = []
    start = None
    for cp in range(MAX_CP):
        if pred(cp):
            if start is None:
                start = cp
        elif start is not None:
            out.append((start, cp - 1))
            start = None
    if start is not None:
        out.append((start, MAX_CP - 1))
    return out


def in_ranges(cp, ranges):
    return any(a <= cp <= b for a, b in ranges)


def cat(cp):
    return unicodedata.category(chr(cp))


def main():
    prepend_set = set()
    for a, b in PREPEND:
        prepend_set.update(range(a, b + 1))

    def is_control(cp):
        if cp in (0x000D, 0x000A):
            return False  # CR/LF are their own classes
        c = cat(cp)
        if c in ("Zl", "Zp"):
            return True
        if c == "Cc":
            return True
        if c == "Cf":
            if cp in (0x200C, 0x200D) or 0xE0020 <= cp <= 0xE007F:
                return False
            if cp in prepend_set:
                return False
            return True
        return False

    def is_extend(cp):
        c = cat(cp)
        if c in ("Mn", "Me"):
            return True
        return in_ranges(cp, EXTEND_EXTRA)

    def is_spacingmark(cp):
        if in_ranges(cp, SPACINGMARK_EXTRA):
            return True
        if cat(cp) != "Mc":
            return False
        if cp in SPACINGMARK_EXCLUDE:
            return False
        if is_extend(cp):
            return False
        return True

    tables = {
        "CONTROL": ranges_from_pred(is_control),
        "EXTEND": ranges_from_pred(is_extend),
        "SPACINGMARK": ranges_from_pred(is_spacingmark),
        "PREPEND": sorted(PREPEND),
        "HANGUL_L": HANGUL_L,
        "HANGUL_V": HANGUL_V,
        "HANGUL_T": HANGUL_T,
        "RI": RI,
        "ZWJ": ZWJ,
        "EXT_PICT": sorted(EXT_PICT),
    }

    lines = [
        '"""Generated by scripts/gen_gcb_tables.py — do not edit by hand.',
        "",
        "Range tables for UAX #29 extended grapheme cluster segmentation,",
        "derived from public Unicode data (general categories via the stdlib",
        '`unicodedata`, plus published UAX #29 / UTS #51 supplements)."""',
        "",
    ]
    for name, ranges in tables.items():
        flat = []
        for a, b in ranges:
            flat.append(a)
            flat.append(b)
        lines.append(f"{name} = {tuple(flat)!r}")
        lines.append("")
    out = "\n".join(lines)
    path = sys.argv[1] if len(sys.argv) > 1 else (
        "headson_spark/kernel/_gcb_data.py")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: " +
          ", ".join(f"{k}={len(v)}r" for k, v in tables.items()))


if __name__ == "__main__":
    main()

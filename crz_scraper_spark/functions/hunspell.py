"""Pure-Python Hunspell affix expansion (SURVEY §7 Hard-3, §2 X6/J7).

Reference behavior: `05_build_special_dictionary.py:42-50` and
`09_clean_tables.py:83-91` open real Hunspell handles
(`Dicts/sk_SK/sk_SK.*`, `Dicts/en_US/en_US.*`) and call `.spell(word)` per
token. The sandbox has no libhunspell, and per-token C calls are the wrong
shape for Spark anyway; the Spark-first equivalent is to EXPAND the
dictionary once at broadcast-build time — apply the .aff PFX/SFX rules to
every .dic stem, producing the full accepted-surface-form set — and then
test membership with the same broadcast semi-join plan `oov_profile` uses
(J7). Expansion cost is dictionary-sized (10^5 stems → ~10^6 forms), paid
once on the driver; the corpus-side plan is unchanged at any scale.

Implemented (from the public hunspell(5) format, not the reference's code):
- FLAG modes: single-char (default), `long` (2-char), `num` (comma ints)
- PFX/SFX rule blocks: strip / append / condition (regex tail/head match),
  `0` sentinels, cross-product (prefix × suffix when both allow it)
- one level of continuation flags on the append field (`append/flags` —
  Hunspell's twofold suffix), enough for possessive-on-plural style chains

Not implemented (absent from the reference's dictionaries or irrelevant to
membership testing): COMPOUNDRULE ordinals, REP/MAP/TRY suggestion tables,
CIRCUMFIX/NEEDAFFIX (en_US.aff and sk_SK.aff use none of them).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterable, Iterator


@dataclass
class AffixEntry:
    strip: str
    append: str
    cond: re.Pattern | None  # None = always applies
    cont_flags: tuple[str, ...] = ()


@dataclass
class AffixRule:
    kind: str  # "PFX" | "SFX"
    flag: str
    cross: bool
    entries: list[AffixEntry] = field(default_factory=list)


@dataclass
class AffFile:
    flag_mode: str = "char"  # char | long | num
    rules: dict[str, AffixRule] = field(default_factory=dict)

    def parse_flags(self, flags: str) -> tuple[str, ...]:
        flags = flags.strip()
        if not flags:
            return ()
        if self.flag_mode == "num":
            return tuple(f.strip() for f in flags.split(",") if f.strip())
        if self.flag_mode == "long":
            return tuple(flags[i : i + 2] for i in range(0, len(flags), 2))
        return tuple(flags)


def _compile_cond(cond: str, kind: str) -> re.Pattern | None:
    if cond == ".":
        return None
    # Hunspell conditions are already a regex subset ([...] classes and
    # literals); anchor to the matching end of the word.
    return re.compile(
        ("^" + cond) if kind == "PFX" else (cond + "$")
    )


def parse_aff(path: str) -> AffFile:
    aff = AffFile()
    with open(path, encoding="utf-8", errors="replace") as fh:
        for raw in fh:
            parts = raw.split("#", 1)[0].split()
            if not parts:
                continue
            key = parts[0]
            if key == "FLAG" and len(parts) >= 2:
                aff.flag_mode = parts[1]
            elif key in ("PFX", "SFX") and len(parts) >= 4:
                flag = parts[1]
                if flag not in aff.rules:
                    # Header line: PFX flag cross_product count
                    aff.rules[flag] = AffixRule(
                        kind=key, flag=flag, cross=parts[2] == "Y"
                    )
                    continue
                # Entry line: PFX flag strip append [condition]
                strip = "" if parts[2] == "0" else parts[2]
                append_raw = "" if parts[3] == "0" else parts[3]
                cont: tuple[str, ...] = ()
                if "/" in append_raw:
                    append_raw, cont_raw = append_raw.split("/", 1)
                    cont = aff.parse_flags(cont_raw)
                cond = parts[4] if len(parts) >= 5 else "."
                aff.rules[flag].entries.append(
                    AffixEntry(
                        strip=strip,
                        append=append_raw,
                        cond=_compile_cond(cond, key),
                        cont_flags=cont,
                    )
                )
    return aff


def iter_dic(path: str) -> Iterator[tuple[str, tuple[str, ...]]]:
    """Yield (word, raw-flag-string-split-later) pairs from a .dic file.

    The flag string is returned RAW (second element is a 1-tuple) because
    flag splitting depends on the .aff FLAG mode — use `expand_dictionary`
    for the joined parse. Lines: `word[/flags][\\tmorph...]`; first line is
    the entry-count header when numeric; `#` lines are comments.
    """
    with open(path, encoding="utf-8", errors="replace") as fh:
        first = True
        for raw in fh:
            line = raw.rstrip("\n").split("\t", 1)[0].strip()
            if not line or line.startswith("#"):
                continue
            if first:
                first = False
                if line.isdigit():
                    continue
            if "/" in line:
                word, flags = line.split("/", 1)
                yield word, (flags,)
            else:
                yield line, ()


def _apply(kind: str, e: AffixEntry, word: str) -> str | None:
    if e.cond is not None and not e.cond.search(word):
        return None
    if kind == "SFX":
        if e.strip and not word.endswith(e.strip):
            return None
        base = word[: len(word) - len(e.strip)] if e.strip else word
        return base + e.append
    if e.strip and not word.startswith(e.strip):
        return None
    return e.append + word[len(e.strip) :]


def expand_entry(word: str, flags: Iterable[str], aff: AffFile) -> set[str]:
    """All surface forms Hunspell accepts for one .dic entry: the base,
    each applicable suffix/prefix form, prefix×suffix cross products, and
    one continuation level on suffix append flags."""
    forms = {word}
    sfx_forms: set[str] = set()  # suffixed forms eligible for cross PFX
    flag_list = [f for f in flags if f in aff.rules]
    for f in flag_list:
        rule = aff.rules[f]
        for e in rule.entries:
            out = _apply(rule.kind, e, word)
            if out is None:
                continue
            forms.add(out)
            if rule.kind == "SFX":
                if rule.cross:
                    sfx_forms.add(out)
                # Twofold: continuation flags on the append field allow one
                # more suffix on the derived form (e.g. plural + possessive).
                for cf in e.cont_flags:
                    crule = aff.rules.get(cf)
                    if crule is None or crule.kind != "SFX":
                        continue
                    for ce in crule.entries:
                        out2 = _apply("SFX", ce, out)
                        if out2 is not None:
                            forms.add(out2)
                            if rule.cross and crule.cross:
                                sfx_forms.add(out2)
    # Cross products: every cross-allowing prefix over the base and every
    # cross-allowing suffixed form.
    for f in flag_list:
        rule = aff.rules[f]
        if rule.kind != "PFX" or not rule.cross:
            continue
        for e in rule.entries:
            for w in {word, *sfx_forms}:
                out = _apply("PFX", e, w)
                if out is not None:
                    forms.add(out)
    return forms


def expand_dictionary(
    dic_path: str, aff_path: str, lower: bool = True
) -> set[str]:
    """The full accepted-form set of a Hunspell dictionary — the broadcast
    wordset for `oov_profile`'s semi-join (one driver-side pass over the
    dictionary; never over corpus data)."""
    aff = parse_aff(aff_path)
    out: set[str] = set()
    for word, raw in iter_dic(dic_path):
        flags = aff.parse_flags(raw[0]) if raw else ()
        for form in expand_entry(word, flags, aff):
            out.add(form.lower() if lower else form)
    return out


def hunspell_dictionary_df(spark, dic_path: str, aff_path: str):
    """Expanded dictionary as a 1-column DataFrame ready for the broadcast
    semi-join in `operators.profiling.oov_profile` — the full-fidelity X6
    path when real .dic/.aff files are available."""
    words = sorted(expand_dictionary(dic_path, aff_path))
    return spark.createDataFrame([(w,) for w in words], "word string")

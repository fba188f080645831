"""tokenizer.json -> component objects.

Host-only, runs once at load.  Defaults and fallbacks mirror
`/root/reference/src/huggingface/parsing.rs`: unparsed/missing normalizer
-> NFC (parsing.rs:89), pre_tokenizer -> ByteLevel (parsing.rs:187-190),
decoder -> ByteLevel (parsing.rs:363); unknown `type` strings -> None.
"""

from __future__ import annotations

from ..core import decoders as D
from ..core import normalizers as N
from ..core import postprocessors as P
from ..core import pretokenizers as PT

__all__ = [
    "parse_normalizer",
    "parse_pre_tokenizer",
    "parse_post_processor",
    "parse_decoder",
    "parse_merges",
]


def parse_merges(raw_merges) -> list[tuple[str, str]]:
    """Dual-format merges: "a b" strings or ["a", "b"] arrays (mod.rs:56-101),
    then split-on-space filtering (mod.rs:252-264)."""
    merges: list[tuple[str, str]] = []
    for item in raw_merges or []:
        if isinstance(item, str):
            parts = item.split(" ")
            if len(parts) == 2:
                merges.append((parts[0], parts[1]))
        elif isinstance(item, (list, tuple)) and len(item) == 2:
            a, b = item
            if isinstance(a, str) and isinstance(b, str):
                # array entries are joined "a b" then re-split, so entries
                # containing spaces are filtered just like string form
                joined = f"{a} {b}"
                parts = joined.split(" ")
                if len(parts) == 2:
                    merges.append((parts[0], parts[1]))
    return merges


def parse_normalizer(value) -> N.Normalizer | None:
    if isinstance(value, dict) and "type" in value:
        t = value.get("type") or ""
        if t == "NFC":
            return N.NFC()
        if t == "NFD":
            return N.NFD()
        if t == "NFKC":
            return N.NFKC()
        if t == "NFKD":
            return N.NFKD()
        if t == "Lowercase":
            return N.Lowercase()
        if t == "Strip":
            return N.Strip()
        if t == "StripAccents":
            return N.StripAccents()
        if t == "Replace":
            pattern = ""
            pat = value.get("pattern")
            if isinstance(pat, dict):
                pattern = pat.get("String") or ""
            return N.Replace(pattern=pattern, replacement=value.get("content") or "")
        if t == "Prepend":
            return N.Prepend(value.get("prepend") or "")
        if t == "Sequence":
            items = value.get("normalizers")
            if isinstance(items, list):
                parsed = [parse_normalizer(v) for v in items]
                parsed = [p for p in parsed if p is not None]
                if parsed:
                    return N.Sequence(parsed)
            return None
        if t == "BertNormalizer":
            return N.BertNormalizer(
                clean_text=_get_bool(value, "clean_text", True),
                handle_chinese_chars=_get_bool(value, "handle_chinese_chars", True),
                strip_accents=(
                    value["strip_accents"]
                    if isinstance(value.get("strip_accents"), bool)
                    else None
                ),
                lowercase=_get_bool(value, "lowercase", True),
            )
        if t == "Precompiled":
            s = value.get("precompiled_charsmap")
            charsmap = [(s, s)] if isinstance(s, str) else []
            return N.Precompiled(charsmap=charsmap)
        return None
    return N.NFC()


def _get_bool(obj, key, default):
    v = obj.get(key)
    return v if isinstance(v, bool) else default


def parse_pre_tokenizer(value) -> PT.PreTokenizer | None:
    if isinstance(value, dict) and "type" in value:
        t = value.get("type") or ""
        if t == "ByteLevel":
            return PT.ByteLevel(
                add_prefix_space=_get_bool(value, "add_prefix_space", False)
            )
        if t == "Metaspace":
            rep = value.get("replacement")
            replacement = rep[0] if isinstance(rep, str) and rep else "▁"
            return PT.Metaspace(
                replacement=replacement,
                add_prefix_space=_get_bool(value, "add_prefix_space", True),
            )
        if t == "Whitespace":
            return PT.Whitespace()
        if t == "WhitespaceSplit":
            return PT.WhitespaceSplit()
        if t == "Punctuation":
            return PT.Punctuation()
        if t == "BertPreTokenizer":
            return PT.BertPreTokenizer()
        if t == "CharDelimiterSplit":
            d = value.get("delimiter")
            delimiter = d[0] if isinstance(d, str) and d else " "
            return PT.CharDelimiterSplit(delimiter=delimiter)
        if t == "UnicodeScripts":
            return PT.UnicodeScripts()
        if t == "Digits":
            return PT.Digits(
                individual_digits=_get_bool(value, "individual_digits", False)
            )
        if t == "Split":
            pattern = ""
            pat = value.get("pattern")
            if isinstance(pat, dict):
                pattern = pat.get("Regex") or ""
            behavior = {
                "Isolated": PT.SplitBehavior.ISOLATED,
                "MergedWithPrevious": PT.SplitBehavior.MERGED_WITH_PREVIOUS,
                "MergedWithNext": PT.SplitBehavior.MERGED_WITH_NEXT,
                "Contiguous": PT.SplitBehavior.CONTIGUOUS,
            }.get(value.get("behavior") or "Removed", PT.SplitBehavior.REMOVED)
            return PT.Split(
                pattern=pattern,
                behavior=behavior,
                invert=_get_bool(value, "invert", False),
            )
        if t == "Sequence":
            items = value.get("pretokenizers")
            if isinstance(items, list):
                parsed = [parse_pre_tokenizer(v) for v in items]
                parsed = [p for p in parsed if p is not None]
                if parsed:
                    return PT.Sequence(parsed)
            return None
        return None
    return PT.ByteLevel(add_prefix_space=False)


def _template_from_array(arr) -> str:
    """HF array-form template -> template string (parsing.rs:248-269)."""
    parts = []
    for item in arr:
        if isinstance(item, dict):
            if "SpecialToken" in item:
                tid = item["SpecialToken"].get("id")
                if isinstance(tid, str):
                    parts.append(tid)
            elif "Sequence" in item:
                sid = item["Sequence"].get("id")
                if isinstance(sid, str):
                    parts.append(f"${sid}")
    return " ".join(parts)


def parse_post_processor(value, special_tokens: dict[str, int]) -> P.PostProcessor | None:
    if isinstance(value, dict) and "type" in value:
        t = value.get("type") or ""
        if t == "TemplateProcessing":
            single_arr = value.get("single")
            single = (
                _template_from_array(single_arr)
                if isinstance(single_arr, list)
                else "<s> $A </s>"
            )
            pair_arr = value.get("pair")
            pair = _template_from_array(pair_arr) if isinstance(pair_arr, list) else None
            tokens = list(special_tokens.items())
            return P.TemplateProcessing(single=single, pair=pair, special_tokens=tokens)
        if t == "RobertaProcessing":
            bos = special_tokens.get("<s>", 0)
            eos = special_tokens.get("</s>", 2)
            return P.RobertaProcessing(
                bos=("<s>", bos), eos=("</s>", eos), add_prefix_space=False
            )
        if t == "BertProcessing":
            cls = special_tokens.get("[CLS]", 101)
            sep = special_tokens.get("[SEP]", 102)
            return P.BertProcessing(cls=("[CLS]", cls), sep=("[SEP]", sep))
        return None
    return None


def parse_decoder(value) -> D.Decoder | None:
    if isinstance(value, dict) and "type" in value:
        t = value.get("type") or ""
        if t == "ByteLevel":
            return D.ByteLevel()
        if t == "Metaspace":
            rep = value.get("replacement")
            replacement = rep[0] if isinstance(rep, str) and rep else "▁"
            return D.Metaspace(
                replacement=replacement,
                add_prefix_space=_get_bool(value, "add_prefix_space", True),
            )
        if t == "WordPiece":
            return D.WordPiece(
                prefix=value.get("prefix") or "##",
                cleanup=_get_bool(value, "cleanup", True),
            )
        if t == "BPE":
            return D.BPEDecoder(suffix=value.get("suffix") or "</w>")
        if t == "CTC":
            wdt = value.get("word_delimiter_token")
            return D.CTC(
                pad_token=value.get("pad_token") or "<pad>",
                word_delimiter_token=wdt if isinstance(wdt, str) else None,
            )
        if t == "Fuse":
            return D.Fuse()
        if t == "Strip":
            c = value.get("content")
            content = c[0] if isinstance(c, str) and c else " "
            return D.Strip(
                content=content,
                start=int(value.get("start") or 0),
                stop=int(value.get("stop") or 0),
            )
        if t == "Sequence":
            items = value.get("decoders")
            if isinstance(items, list):
                parsed = [parse_decoder(v) for v in items]
                parsed = [p for p in parsed if p is not None]
                if parsed:
                    return D.Sequence(parsed)
            return None
        return None
    return D.ByteLevel()

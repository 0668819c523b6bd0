"""Japanese text → IPA phonemes.

The reference (utils/g2p/japanese.py:74-145) uses pyopenjtalk (C++)
full-context labels for G2P + pitch accent. That dependency is unavailable in
this image, so this module implements the same phoneme conventions from kana
directly: kana → OpenJTalk-style romaji phonemes (shi/chi/tsu/cl/N...), then
the identical sokuon/hatsuon rewrites and romaji→ipa2 substitutions.

Limitations vs the reference (documented, improvable without API changes):
pitch-accent marks (↑/↓) require a lexicon and are not emitted; kanji are
read through an embedded common-word table and are otherwise dropped, so
kana or mixed kana input is strongly preferred.
"""

from __future__ import annotations

import re
import unicodedata

# ％ → パーセント (reference: utils/g2p/japanese.py:15-17)
_SYMBOLS_TO_JAPANESE = [("％", "パーセント")]

_japanese_characters = re.compile(
    r"[A-Za-z\d々぀-ヿ一-鿿１-９Ａ-Ｚ"
    r"ａ-ｚｦ-ﾝ]"
)
_japanese_marks = re.compile(
    r"[^A-Za-z\d々぀-ヿ一-鿿１-９Ａ-Ｚ"
    r"ａ-ｚｦ-ﾝ]"
)

# ---------------------------------------------------------------------------
# Embedded readings for common kanji words (word → hiragana).
# ---------------------------------------------------------------------------

KANJI_READINGS = {
    "私": "わたし", "僕": "ぼく", "俺": "おれ", "君": "きみ", "彼": "かれ",
    "彼女": "かのじょ", "人": "ひと", "今日": "きょう", "明日": "あした",
    "昨日": "きのう", "今": "いま", "時間": "じかん", "時": "とき",
    "年": "ねん", "月": "つき", "日": "ひ", "週": "しゅう", "分": "ふん",
    "秒": "びょう", "朝": "あさ", "昼": "ひる", "夜": "よる", "晩": "ばん",
    "水": "みず", "火": "ひ", "木": "き", "金": "かね", "土": "つち",
    "空": "そら", "海": "うみ", "山": "やま", "川": "かわ", "森": "もり",
    "雨": "あめ", "雪": "ゆき", "風": "かぜ", "星": "ほし", "花": "はな",
    "犬": "いぬ", "猫": "ねこ", "鳥": "とり", "魚": "さかな", "馬": "うま",
    "家": "いえ", "部屋": "へや", "学校": "がっこう", "会社": "かいしゃ",
    "仕事": "しごと", "先生": "せんせい", "学生": "がくせい",
    "友達": "ともだち", "家族": "かぞく", "母": "はは", "父": "ちち",
    "子供": "こども", "男": "おとこ", "女": "おんな", "名前": "なまえ",
    "言葉": "ことば", "日本": "にほん", "日本語": "にほんご",
    "英語": "えいご", "中国語": "ちゅうごくご", "世界": "せかい",
    "国": "くに", "町": "まち", "街": "まち", "道": "みち", "駅": "えき",
    "電車": "でんしゃ", "車": "くるま", "飛行機": "ひこうき",
    "電話": "でんわ", "音": "おと", "声": "こえ", "音楽": "おんがく",
    "歌": "うた", "映画": "えいが", "本": "ほん", "話": "はなし",
    "手": "て", "足": "あし", "目": "め", "耳": "みみ", "口": "くち",
    "頭": "あたま", "心": "こころ", "体": "からだ", "顔": "かお",
    "食事": "しょくじ", "朝食": "ちょうしょく", "昼食": "ちゅうしょく",
    "夕食": "ゆうしょく", "料理": "りょうり", "水曜日": "すいようび",
    "月曜日": "げつようび", "火曜日": "かようび", "木曜日": "もくようび",
    "金曜日": "きんようび", "土曜日": "どようび", "日曜日": "にちようび",
    "一": "いち", "二": "に", "三": "さん", "四": "よん", "五": "ご",
    "六": "ろく", "七": "なな", "八": "はち", "九": "きゅう", "十": "じゅう",
    "百": "ひゃく", "千": "せん", "万": "まん", "円": "えん",
    "何": "なに", "誰": "だれ", "大丈夫": "だいじょうぶ",
    "大きい": "おおきい", "小さい": "ちいさい", "新しい": "あたらしい",
    "古い": "ふるい", "良い": "よい", "悪い": "わるい", "高い": "たかい",
    "安い": "やすい", "長い": "ながい", "短い": "みじかい",
    "早い": "はやい", "速い": "はやい", "遅い": "おそい",
    "暑い": "あつい", "寒い": "さむい", "熱い": "あつい",
    "冷たい": "つめたい", "楽しい": "たのしい", "嬉しい": "うれしい",
    "悲しい": "かなしい", "面白い": "おもしろい", "美しい": "うつくしい",
    "可愛い": "かわいい", "好き": "すき", "嫌い": "きらい",
    "食べる": "たべる", "飲む": "のむ", "行く": "いく", "来る": "くる",
    "帰る": "かえる", "見る": "みる", "聞く": "きく", "話す": "はなす",
    "読む": "よむ", "書く": "かく", "買う": "かう", "売る": "うる",
    "作る": "つくる", "使う": "つかう", "思う": "おもう", "知る": "しる",
    "分かる": "わかる", "出来る": "できる", "出る": "でる",
    "入る": "はいる", "会う": "あう", "待つ": "まつ", "持つ": "もつ",
    "歩く": "あるく", "走る": "はしる", "泳ぐ": "およぐ", "寝る": "ねる",
    "起きる": "おきる", "働く": "はたらく", "休む": "やすむ",
    "勉強": "べんきょう", "旅行": "りょこう", "写真": "しゃしん",
    "質問": "しつもん", "答え": "こたえ", "問題": "もんだい",
    "天気": "てんき", "元気": "げんき", "気持ち": "きもち",
    "有難う": "ありがとう", "有り難う": "ありがとう",
    "御座います": "ございます", "お早う": "おはよう",
    "今晩は": "こんばんは", "今日は": "こんにちは",
}

# ---------------------------------------------------------------------------
# Kana → OpenJTalk-style romaji phoneme strings
# ---------------------------------------------------------------------------

_YOUON = {
    "きゃ": "kya", "きゅ": "kyu", "きょ": "kyo",
    "しゃ": "sha", "しゅ": "shu", "しょ": "sho",
    "ちゃ": "cha", "ちゅ": "chu", "ちょ": "cho",
    "にゃ": "nya", "にゅ": "nyu", "にょ": "nyo",
    "ひゃ": "hya", "ひゅ": "hyu", "ひょ": "hyo",
    "みゃ": "mya", "みゅ": "myu", "みょ": "myo",
    "りゃ": "rya", "りゅ": "ryu", "りょ": "ryo",
    "ぎゃ": "gya", "ぎゅ": "gyu", "ぎょ": "gyo",
    "じゃ": "ja", "じゅ": "ju", "じょ": "jo",
    "ぢゃ": "ja", "ぢゅ": "ju", "ぢょ": "jo",
    "びゃ": "bya", "びゅ": "byu", "びょ": "byo",
    "ぴゃ": "pya", "ぴゅ": "pyu", "ぴょ": "pyo",
    "ふぁ": "fa", "ふぃ": "fi", "ふぇ": "fe", "ふぉ": "fo",
    "てぃ": "ti", "でぃ": "di", "うぃ": "wi", "うぇ": "we",
    "しぇ": "she", "ちぇ": "che", "じぇ": "je",
    "ヴぁ": "ba", "ヴぃ": "bi", "ヴぇ": "be", "ヴぉ": "bo",
}

_GOJUON = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "ゐ": "i", "ゑ": "e", "を": "o", "ん": "N",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ゔ": "bu",
}

_SMALL_VOWELS = {"ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o"}
_VOWEL_OF = {"a": "a", "i": "i", "u": "u", "e": "e", "o": "o", "N": ""}


def _kata_to_hira(text: str) -> str:
    out = []
    for ch in text:
        code = ord(ch)
        if 0x30A1 <= code <= 0x30F6:  # ァ..ヶ
            out.append(chr(code - 0x60))
        else:
            out.append(ch)
    return "".join(out)


def _replace_kanji(text: str) -> str:
    """Longest-match replacement of known kanji words with kana readings."""
    keys = sorted(KANJI_READINGS, key=len, reverse=True)
    for k in keys:
        if k in text:
            text = text.replace(k, KANJI_READINGS[k])
    # drop any remaining kanji (unknown readings)
    return re.sub(r"[一-鿿々]", "", text)


def kana_to_romaji(text: str) -> str:
    """Hiragana/katakana string → OpenJTalk-style phoneme romaji."""
    text = _kata_to_hira(text)
    out = []
    i = 0
    n = len(text)
    while i < n:
        two = text[i : i + 2]
        ch = text[i]
        if two in _YOUON:
            out.append(_YOUON[two])
            i += 2
            continue
        if ch == "っ":
            out.append("cl")  # sokuon marker (geminate)
            i += 1
            continue
        if ch == "ー":
            # long vowel: repeat previous vowel
            if out:
                prev = out[-1]
                for v in reversed(prev):
                    if v in "aiueo":
                        out.append(v)
                        break
            i += 1
            continue
        if ch in _SMALL_VOWELS:
            out.append(_SMALL_VOWELS[ch])
            i += 1
            continue
        if ch in _GOJUON:
            out.append(_GOJUON[ch])
            i += 1
            continue
        i += 1  # skip unknown
    return "".join(out)


def japanese_to_romaji_with_accent(text: str) -> str:
    """Japanese text → romaji phonemes, punctuation ascii-folded.

    Same output contract as the reference function (ch→ʧ, sh→ʃ, cl→Q,
    sentence chunks joined with spaces) minus pitch-accent marks.
    """
    for sym, jp in _SYMBOLS_TO_JAPANESE:
        text = text.replace(sym, jp)
    sentences = re.split(_japanese_marks, text)
    marks = re.findall(_japanese_marks, text)
    out = ""
    for i, sentence in enumerate(sentences):
        if re.match(_japanese_characters, sentence):
            if out != "":
                out += " "
            romaji = kana_to_romaji(_replace_kanji(sentence))
            romaji = (
                romaji.replace("ch", "ʧ").replace("sh", "ʃ").replace("cl", "Q")
            )
            out += romaji
        if i < len(marks):
            mark = unicodedata.normalize("NFKC", marks[i]).replace(" ", "")
            out += "".join(c for c in mark if ord(c) < 128 or c in "、。！？")
    out = out.replace("、", ",").replace("。", ".").replace("！", "!").replace(
        "？", "?"
    )
    return out


# Sokuon/hatsuon rewrites (reference: utils/g2p/japanese.py:53-67)
_REAL_SOKUON = [
    (re.compile(r"Q([↑↓]*[kg])"), r"k#\1"),
    (re.compile(r"Q([↑↓]*[tdjʧ])"), r"t#\1"),
    (re.compile(r"Q([↑↓]*[sʃ])"), r"s\1"),
    (re.compile(r"Q([↑↓]*[pb])"), r"p#\1"),
]
_REAL_HATSUON = [
    (re.compile(r"N([↑↓]*[pbm])"), r"m\1"),
    (re.compile(r"N([↑↓]*[ʧʥj])"), r"n^\1"),
    (re.compile(r"N([↑↓]*[tdn])"), r"n\1"),
    (re.compile(r"N([↑↓]*[kg])"), r"ŋ\1"),
]

# romaji → ipa2 (reference: utils/g2p/japanese.py:36-50), order matters
_ROMAJI_TO_IPA2 = [
    ("u", "ɯ"), ("ʧ", "tʃ"), ("j", "dʑ"), ("y", "j"), ("ni", "n^i"),
    ("nj", "n^"), ("hi", "çi"), ("hj", "ç"), ("f", "ɸ"), ("I", "i*"),
    ("U", "ɯ*"), ("r", "ɾ"),
]


def japanese_to_ipa2(text: str) -> str:
    text = japanese_to_romaji_with_accent(text).replace("...", "…")
    for regex, repl in _REAL_SOKUON:
        text = regex.sub(repl, text)
    for regex, repl in _REAL_HATSUON:
        text = regex.sub(repl, text)
    for pat, repl in _ROMAJI_TO_IPA2:
        text = text.replace(pat, repl)
    return text

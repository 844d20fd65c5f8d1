"""Character-trigram language identification (26 languages).

Public-knowledge approach (Cavnar & Trenkle 1994, "N-Gram-Based Text
Categorization"): each language gets a profile of weighted character
trigrams built from a small embedded seed text; a document is scored by
cosine similarity between its trigram counts and every profile, argmax
wins.  Non-Latin scripts need no special casing — trigram codes are
Unicode-codepoint based, so Cyrillic/Greek/Arabic/Hebrew/Devanagari/
Han/Kana/Hangul profiles only ever match documents in their own script.

Vectorized across the BATCH (the simhash/rolling-fingerprint pattern from
``ops/text.py``): all normalized texts concatenate into one codepoint
array (UTF-32 view), every trigram becomes one int64 code via two
shift-adds, profile lookups are a single ``np.searchsorted`` against the
sorted vocabulary, and per-document score accumulation is one
``np.add.at`` into an (n_docs, n_langs) matrix — no per-document Python
in the scoring path.

Seed texts are short original prose plus each language's rendering of a
universally published sentence (UDHR art. 1) — public material chosen for
function-word coverage.  RAQC analog: none (text-payload operator
mandated by the task brief).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# ~4 sentences of natural prose per language. Function words dominate
# trigram mass, which is exactly what transfers to unseen documents.
_LANG_SEEDS: dict[str, str] = {
    "en": ("the quick brown fox jumps over the lazy dog. it was the best "
           "of times and it was the worst of times. all human beings are "
           "born free and equal in dignity and rights. i would like to "
           "know why the weather is so beautiful today. this is a story "
           "about the people who live in the house on the hill."),
    "de": ("der schnelle braune fuchs springt über den faulen hund. es war "
           "einmal ein kleines mädchen das im wald wohnte. alle menschen "
           "sind frei und gleich an würde und rechten geboren. ich möchte "
           "gerne wissen warum das wetter heute so schön ist. wir haben "
           "nicht gewusst dass die geschichte so lange dauern würde."),
    "fr": ("le renard brun rapide saute par dessus le chien paresseux. il "
           "était une fois une petite fille qui habitait dans la forêt. "
           "tous les êtres humains naissent libres et égaux en dignité et "
           "en droits. je voudrais savoir pourquoi le temps est si beau "
           "aujourd'hui. c'est une histoire sur les gens qui vivent ici."),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso. érase "
           "una vez una niña pequeña que vivía en el bosque. todos los "
           "seres humanos nacen libres e iguales en dignidad y derechos. "
           "me gustaría saber por qué hace tan buen tiempo hoy. esta es "
           "una historia sobre la gente que vive en la casa de la colina."),
    "it": ("la rapida volpe marrone salta sopra il cane pigro. c'era una "
           "volta una bambina che viveva nel bosco. tutti gli esseri umani "
           "nascono liberi ed eguali in dignità e diritti. vorrei sapere "
           "perché oggi il tempo è così bello. questa è una storia sulle "
           "persone che vivono nella casa sulla collina."),
    "pt": ("a rápida raposa marrom salta sobre o cão preguiçoso. era uma "
           "vez uma menina que morava na floresta. todos os seres humanos "
           "nascem livres e iguais em dignidade e direitos. eu gostaria de "
           "saber por que o tempo está tão bom hoje. esta é uma história "
           "sobre as pessoas que moram na casa da colina."),
    "nl": ("de snelle bruine vos springt over de luie hond. er was eens "
           "een klein meisje dat in het bos woonde. alle mensen worden "
           "vrij en gelijk in waardigheid en rechten geboren. ik zou graag "
           "willen weten waarom het weer vandaag zo mooi is. dit is een "
           "verhaal over de mensen die in het huis op de heuvel wonen."),
    "sv": ("den snabba bruna räven hoppar över den lata hunden. det var en "
           "gång en liten flicka som bodde i skogen. alla människor är "
           "födda fria och lika i värde och rättigheter. jag skulle vilja "
           "veta varför vädret är så vackert idag. det här är en berättelse "
           "om människorna som bor i huset på kullen."),
    "da": ("den hurtige brune ræv springer over den dovne hund. der var "
           "engang en lille pige som boede i skoven. alle mennesker er "
           "født frie og lige i værdighed og rettigheder. jeg vil gerne "
           "vide hvorfor vejret er så smukt i dag. det her er en historie "
           "om de mennesker der bor i huset på bakken."),
    "fi": ("nopea ruskea kettu hyppää laiskan koiran yli. olipa kerran "
           "pieni tyttö joka asui metsässä. kaikki ihmiset syntyvät "
           "vapaina ja tasavertaisina arvoltaan ja oikeuksiltaan. "
           "haluaisin tietää miksi sää on tänään niin kaunis. tämä on "
           "tarina ihmisistä jotka asuvat talossa mäellä."),
    "pl": ("szybki brązowy lis przeskakuje nad leniwym psem. dawno temu "
           "była sobie mała dziewczynka która mieszkała w lesie. wszyscy "
           "ludzie rodzą się wolni i równi pod względem swej godności i "
           "swych praw. chciałbym wiedzieć dlaczego pogoda jest dzisiaj "
           "taka piękna. to jest opowieść o ludziach którzy mieszkają tu."),
    "cs": ("rychlá hnědá liška skáče přes líného psa. byla jednou jedna "
           "malá holčička která bydlela v lese. všichni lidé se rodí "
           "svobodní a sobě rovní co do důstojnosti a práv. chtěl bych "
           "vědět proč je dnes tak krásné počasí. tohle je příběh o "
           "lidech kteří bydlí v domě na kopci."),
    "ro": ("vulpea maro rapidă sare peste câinele leneș. a fost odată o "
           "fetiță care locuia în pădure. toate ființele umane se nasc "
           "libere și egale în demnitate și în drepturi. aș vrea să știu "
           "de ce vremea este atât de frumoasă astăzi. aceasta este o "
           "poveste despre oamenii care locuiesc în casa de pe deal."),
    "hu": ("a gyors barna róka átugrik a lusta kutya felett. egyszer volt "
           "hol nem volt egy kislány aki az erdőben élt. minden emberi "
           "lény szabadon születik és egyenlő méltósága és joga van. "
           "szeretném tudni miért olyan szép ma az idő. ez egy történet "
           "azokról az emberekről akik a dombon lévő házban laknak."),
    "tr": ("hızlı kahverengi tilki tembel köpeğin üzerinden atlar. bir "
           "zamanlar ormanda yaşayan küçük bir kız varmış. bütün insanlar "
           "hür haysiyet ve haklar bakımından eşit doğarlar. bugün havanın "
           "neden bu kadar güzel olduğunu bilmek istiyorum. bu tepedeki "
           "evde yaşayan insanlar hakkında bir hikaye. bu sabah erken "
           "kalktım ve kahvaltıdan önce yürüyüşe çıktım. çocuklar okuldan "
           "sonra parkta oyun oynamayı çok severler. akşam yemeğinden "
           "sonra hep birlikte çay içtik ve sohbet ettik."),
    "id": ("rubah coklat yang cepat melompati anjing yang malas. pada "
           "suatu hari ada seorang gadis kecil yang tinggal di hutan. "
           "semua orang dilahirkan merdeka dan mempunyai martabat dan hak "
           "yang sama. saya ingin tahu mengapa cuaca hari ini begitu "
           "indah. ini adalah cerita tentang orang yang tinggal di bukit."),
    "vi": ("con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng. ngày xửa "
           "ngày xưa có một cô bé sống trong rừng. tất cả mọi người sinh "
           "ra đều được tự do và bình đẳng về nhân phẩm và quyền lợi. tôi "
           "muốn biết tại sao thời tiết hôm nay đẹp như vậy. đây là câu "
           "chuyện về những người sống trong ngôi nhà trên đồi."),
    "ru": ("быстрая коричневая лиса перепрыгивает через ленивую собаку. "
           "жила была маленькая девочка которая жила в лесу. все люди "
           "рождаются свободными и равными в своём достоинстве и правах. "
           "я хотел бы знать почему сегодня такая хорошая погода. это "
           "история о людях которые живут в доме на холме."),
    "uk": ("швидка коричнева лисиця перестрибує через ледачого собаку. "
           "жила була маленька дівчинка яка жила в лісі. всі люди "
           "народжуються вільними і рівними у своїй гідності та правах. "
           "я хотів би знати чому сьогодні така гарна погода. це історія "
           "про людей які живуть у будинку на пагорбі."),
    "el": ("η γρήγορη καφέ αλεπού πηδάει πάνω από τον τεμπέλη σκύλο. μια "
           "φορά και έναν καιρό ήταν ένα μικρό κορίτσι που ζούσε στο "
           "δάσος. όλοι οι άνθρωποι γεννιούνται ελεύθεροι και ίσοι στην "
           "αξιοπρέπεια και τα δικαιώματα. θα ήθελα να ξέρω γιατί ο "
           "καιρός είναι τόσο όμορφος σήμερα."),
    "ar": ("الثعلب البني السريع يقفز فوق الكلب الكسول. كان يا ما كان فتاة "
           "صغيرة تعيش في الغابة. يولد جميع الناس أحرارا متساوين في "
           "الكرامة والحقوق. أريد أن أعرف لماذا الطقس جميل جدا اليوم."),
    "he": ("השועל החום המהיר קופץ מעל הכלב העצלן. היה היתה ילדה קטנה "
           "שגרה ביער. כל בני האדם נולדו בני חורין ושווים בערכם "
           "ובזכויותיהם. אני רוצה לדעת למה מזג האוויר כל כך יפה היום."),
    "hi": ("तेज भूरी लोमड़ी आलसी कुत्ते के ऊपर से कूदती है। एक समय की बात है एक "
           "छोटी लड़की जंगल में रहती थी। सभी मनुष्य जन्म से स्वतंत्र तथा मर्यादा और "
           "अधिकारों में समान होते हैं। मैं जानना चाहता हूं कि आज मौसम इतना सुंदर "
           "क्यों है।"),
    "zh": ("敏捷的棕色狐狸跳过了懒惰的狗。从前有一个小女孩住在森林里。"
           "人人生而自由，在尊严和权利上一律平等。我想知道为什么今天天气"
           "这么好。这是一个关于住在山上房子里的人们的故事。"),
    "ja": ("素早い茶色の狐は怠け者の犬を飛び越えます。昔々、森の中に小さ"
           "な女の子が住んでいました。すべての人間は生まれながらにして自"
           "由であり、尊厳と権利について平等である。今日はなぜこんなに天"
           "気がいいのか知りたいです。"),
    "ko": ("빠른 갈색 여우가 게으른 개를 뛰어넘는다. 옛날 옛적에 숲속에 "
           "작은 소녀가 살고 있었다. 모든 인간은 태어날 때부터 자유로우며 "
           "존엄과 권리에 있어 평등하다. 오늘 날씨가 왜 이렇게 좋은지 알고 "
           "싶다."),
}

# strip digits/underscore and punctuation; \w keeps Unicode letters
_NORM_RE = re.compile(r"[^\w\s]|[\d_]")
_WS_RE = re.compile(r"\s+")

_SHIFT = np.int64(21)  # codepoints < 2^21 → n-gram code fits int64

# (start, end, script) codepoint ranges for single-language scripts and
# the two multi-language script classes (latin, cyrillic)
_SCRIPT_RANGES = [
    (0x0041, 0x005B, "latin"), (0x0061, 0x007B, "latin"),
    (0x00C0, 0x0250, "latin"), (0x1E00, 0x1F00, "latin"),
    (0x0370, 0x0400, "greek"),
    (0x0400, 0x0500, "cyrillic"),
    (0x0590, 0x0600, "hebrew"),
    (0x0600, 0x0700, "arabic"), (0x0750, 0x0780, "arabic"),
    (0x0900, 0x0980, "devanagari"),
    (0x3040, 0x3100, "kana"),
    (0x3400, 0x4DC0, "han"), (0x4E00, 0xA000, "han"),
    (0x1100, 0x1200, "hangul"), (0xAC00, 0xD7B0, "hangul"),
]
_SCRIPT_RANGES.sort()  # searchsorted below needs ascending boundaries
_SCRIPTS = sorted({s for _, _, s in _SCRIPT_RANGES})
# scripts that identify a language outright (kana beats han: any kana in
# a han-heavy doc means Japanese)
_SCRIPT_LANG = {"greek": "el", "hebrew": "he", "arabic": "ar",
                "devanagari": "hi", "hangul": "ko", "han": "zh",
                "kana": "ja"}
_CYRILLIC_LANGS = ("ru", "uk")


def _normalize(s: str) -> str:
    return _WS_RE.sub(" ", _NORM_RE.sub(" ", (s or "").lower())).strip()


def _ngram_codes(texts: list[str]) -> tuple[np.ndarray, np.ndarray,
                                            np.ndarray, np.ndarray]:
    """Bigram and trigram codes of ``texts`` (each padded with one space
    a side) plus per-code document indices — one UTF-32 decode and a few
    shifted views, no per-character Python.  Bigram codes (< 2^42) and
    trigram codes (≥ 2^42) occupy disjoint ranges, so one vocabulary
    holds both."""
    padded = [" " + t + " " for t in texts]
    joined = "\x00".join(padded)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32
                       ).astype(np.int64)
    lens = np.fromiter((len(p) for p in padded), dtype=np.int64,
                       count=len(padded))
    starts = np.concatenate([[0], np.cumsum(lens + 1)[:-1]])
    if len(cp) < 2:
        e = np.empty(0, np.int64)
        return e, e, e, e
    c0, c1 = cp[:-1], cp[1:]
    bi = (c0 << _SHIFT) + c1
    bval = (c0 != 0) & (c1 != 0)
    bdoc = np.searchsorted(starts, np.arange(len(cp) - 1), side="right") - 1
    if len(cp) < 3:
        e = np.empty(0, np.int64)
        return bi[bval], bdoc[bval], e, e
    t0, t1, t2 = cp[:-2], cp[1:-1], cp[2:]
    tri = (((t0 << _SHIFT) + t1) << _SHIFT) + t2
    tval = (t0 != 0) & (t1 != 0) & (t2 != 0)
    tdoc = bdoc[: len(cp) - 2]
    return bi[bval], bdoc[bval], tri[tval], tdoc[tval]


def _script_counts(texts: list[str]) -> np.ndarray:
    """(n_docs, n_scripts) letter counts per script class, vectorized:
    codepoints bucket via one searchsorted over the range boundaries."""
    joined = "\x00".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32
                       ).astype(np.int64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                       count=len(texts))
    starts = np.concatenate([[0], np.cumsum(lens + 1)[:-1]])
    doc_idx = np.searchsorted(starts, np.arange(len(cp)), side="right") - 1
    bounds = np.array([b for r in _SCRIPT_RANGES for b in r[:2]],
                      dtype=np.int64)
    lut = np.full(2 * len(_SCRIPT_RANGES) + 1, -1, dtype=np.int64)
    for i, (_, _, s) in enumerate(_SCRIPT_RANGES):
        lut[2 * i + 1] = _SCRIPTS.index(s)
    bucket = lut[np.searchsorted(bounds, cp, side="right")]
    out = np.zeros((len(texts), len(_SCRIPTS)), dtype=np.int64)
    hit = bucket >= 0
    np.add.at(out, (doc_idx[hit], bucket[hit]), 1)
    return out


def _seed_codes(lg: str) -> np.ndarray:
    bi, _, tri, _ = _ngram_codes([_normalize(_LANG_SEEDS[lg])])
    return np.concatenate([bi, tri])


def _build_model(top_n: int = 700):
    """(langs, sorted vocab codes, (n_langs, V) unit-norm weight matrix).

    Profiles mix bigrams and trigrams (Cavnar–Trenkle keeps 1–5-grams;
    two sizes cover both morphology and function words at this seed
    size).  Weight = log(1 + tf) × idf over the seed profiles; each
    language row is L2-normalized so the argmax over
    ``doc_counts @ P.T`` is a cosine argmax (the document norm is a
    per-row constant)."""
    langs = sorted(_LANG_SEEDS)
    per_lang: list[dict[int, float]] = []
    for lg in langs:
        u, c = np.unique(_seed_codes(lg), return_counts=True)
        if len(u) > top_n:
            keep = np.argsort(-c)[:top_n]
            u, c = u[keep], c[keep]
        per_lang.append(dict(zip(u.tolist(), np.log1p(c).tolist())))
    vocab = np.array(sorted({t for d in per_lang for t in d}), dtype=np.int64)
    df = np.zeros(len(vocab), dtype=np.float64)
    pos = {int(t): i for i, t in enumerate(vocab)}
    for d in per_lang:
        for t in d:
            df[pos[t]] += 1
    idf = np.log(1.0 + len(langs) / df)
    P = np.zeros((len(langs), len(vocab)), dtype=np.float64)
    for li, d in enumerate(per_lang):
        for t, w in d.items():
            P[li, pos[t]] = w
    P *= idf[None, :]
    # trigrams (codes ≥ 2^42) carry more language signal than bigrams —
    # upweight them before row normalization
    P[:, vocab >= (1 << 42)] *= 2.0
    P /= np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
    return langs, vocab, P


class TrigramLangId:
    """Batch language identifier — model built once per actor in
    ``__init__``, scoring is numpy-only per batch.

    Two stages: (1) script classification by codepoint-range counts —
    single-language scripts (Greek, Hebrew, Arabic, Devanagari, Hangul,
    Kana, Han) decide outright, and the n-gram argmax is restricted to
    the doc's script class otherwise; (2) cosine argmax of bigram+trigram
    counts against the seeded profiles within {latin...} or {ru, uk}."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.langs, self.vocab, self.P = _build_model()
        self.lang_arr = np.array(self.langs + ["other"], dtype=object)
        self.lang_pos = {lg: i for i, lg in enumerate(self.langs)}
        cyr = np.zeros(len(self.langs), dtype=bool)
        for lg in _CYRILLIC_LANGS:
            cyr[self.lang_pos[lg]] = True
        script_only = np.zeros(len(self.langs), dtype=bool)
        for lg in _SCRIPT_LANG.values():
            if lg in self.lang_pos:
                script_only[self.lang_pos[lg]] = True
        self.allowed_latin = ~cyr & ~script_only
        self.allowed_cyr = cyr

    def predict(self, texts: list[str]) -> np.ndarray:
        norm = [_normalize(t) for t in texts]
        n = len(texts)
        nl = len(self.langs)
        sc = _script_counts(norm)
        kana = sc[:, _SCRIPTS.index("kana")]
        # n-gram scores (all docs at once)
        bi, bdoc, tri, tdoc = _ngram_codes(norm)
        codes = np.concatenate([bi, tri])
        doc_idx = np.concatenate([bdoc, tdoc])
        scores = np.zeros((n, nl), dtype=np.float64)
        n_grams = np.zeros(n, dtype=np.int64)
        n_hits = np.zeros(n, dtype=np.int64)
        if len(codes):
            np.add.at(n_grams, doc_idx, 1)
            vi = np.clip(np.searchsorted(self.vocab, codes), 0,
                         len(self.vocab) - 1)
            hit = self.vocab[vi] == codes
            np.add.at(scores, doc_idx[hit], self.P[:, vi[hit]].T)
            np.add.at(n_hits, doc_idx[hit], 1)
        # script gating
        total = np.maximum(sc.sum(axis=1), 1)
        dominant = np.argmax(sc, axis=1)
        dom_frac = sc[np.arange(n), dominant] / total
        allowed = np.where(
            (_np_isin_names(dominant, "cyrillic") & (dom_frac > 0.5))[:, None],
            self.allowed_cyr[None, :], self.allowed_latin[None, :])
        masked = np.where(allowed, scores, -1.0)
        best = np.argmax(masked, axis=1)
        # no evidence → "other": nothing matched, or the text is mostly
        # out-of-profile n-grams (gibberish / unsupported language)
        hit_rate = n_hits / np.maximum(n_grams, 1)
        confident = ((masked[np.arange(n), best] > 0.0)
                     & (hit_rate >= 0.25) & (n_hits >= 8))
        out = self.lang_arr[np.where(confident, best, nl)]
        # single-language scripts override the n-gram vote when dominant
        for script, lg in _SCRIPT_LANG.items():
            si = _SCRIPTS.index(script)
            strong = (sc[:, si] / total > 0.5)
            if script == "han":
                strong &= kana == 0  # kana present → Japanese
            out = np.where(strong, lg, out)
        out = np.where((kana / total > 0.05), "ja", out)
        return out

    def predict_one(self, text: str) -> str:
        return str(self.predict([text or ""])[0])

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"doc_id": df["doc_id"]})
        if "lang" in df.columns:
            out["lang"] = df["lang"]
        out["lang_pred"] = self.predict(df[self.text_col].fillna("").tolist())
        return out


def _np_isin_names(dominant: np.ndarray, name: str) -> np.ndarray:
    return dominant == _SCRIPTS.index(name)

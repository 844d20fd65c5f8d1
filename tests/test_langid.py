"""Language-ID accuracy gate (VERDICT r2 Next #6).

Planted multilingual fixture: three held-out sentences per language —
none appear in the model's seed texts — across all 26 supported
languages.  Gate: accuracy ≥ 0.95 over the 78 labeled docs, plus the
"other" contract for gibberish/empty input, plus the Ray actor-pool
plumbing (q16 path)."""

import numpy as np
import pandas as pd
import pytest

# lang → three held-out sentences (market / late-train / brother's-shop)
FIXTURE = {
    "en": ["she walked to the market in the morning and bought some bread for her family",
           "the train was late again so we waited at the station for almost an hour",
           "my brother works in a small shop near the old bridge"],
    "de": ["am nächsten morgen ging sie zum markt und kaufte frisches brot für ihre familie",
           "der zug hatte wieder verspätung also warteten wir fast eine stunde am bahnhof",
           "mein bruder arbeitet in einem kleinen laden in der nähe der alten brücke"],
    "fr": ["le lendemain matin elle est allée au marché et a acheté du pain frais pour sa famille",
           "le train était encore en retard alors nous avons attendu à la gare pendant presque une heure",
           "mon frère travaille dans un petit magasin près du vieux pont"],
    "es": ["a la mañana siguiente fue al mercado y compró pan fresco para su familia",
           "el tren llegó tarde otra vez así que esperamos en la estación casi una hora",
           "mi hermano trabaja en una pequeña tienda cerca del puente viejo"],
    "it": ["la mattina seguente è andata al mercato e ha comprato del pane fresco per la sua famiglia",
           "il treno era di nuovo in ritardo quindi abbiamo aspettato alla stazione per quasi un'ora",
           "mio fratello lavora in un piccolo negozio vicino al vecchio ponte"],
    "pt": ["na manhã seguinte ela foi ao mercado e comprou pão fresco para sua família",
           "o trem estava atrasado de novo então esperamos na estação por quase uma hora",
           "meu irmão trabalha em uma pequena loja perto da ponte velha"],
    "nl": ["de volgende ochtend ging ze naar de markt en kocht vers brood voor haar gezin",
           "de trein was weer te laat dus we wachtten bijna een uur op het station",
           "mijn broer werkt in een kleine winkel bij de oude brug"],
    "sv": ["nästa morgon gick hon till marknaden och köpte färskt bröd till sin familj",
           "tåget var försenat igen så vi väntade på stationen i nästan en timme",
           "min bror arbetar i en liten butik nära den gamla bron"],
    "da": ["næste morgen gik hun på markedet og købte frisk brød til sin familie",
           "toget var forsinket igen så vi ventede på stationen i næsten en time",
           "min bror arbejder i en lille butik nær den gamle bro"],
    "fi": ["seuraavana aamuna hän meni torille ja osti tuoretta leipää perheelleen",
           "juna oli taas myöhässä joten odotimme asemalla melkein tunnin",
           "veljeni työskentelee pienessä kaupassa vanhan sillan lähellä"],
    "pl": ["następnego ranka poszła na targ i kupiła świeży chleb dla swojej rodziny",
           "pociąg znowu się spóźnił więc czekaliśmy na stacji prawie godzinę",
           "mój brat pracuje w małym sklepie niedaleko starego mostu"],
    "cs": ["druhý den ráno šla na trh a koupila čerstvý chléb pro svou rodinu",
           "vlak měl zase zpoždění takže jsme čekali na nádraží skoro hodinu",
           "můj bratr pracuje v malém obchodě poblíž starého mostu"],
    "ro": ["a doua zi dimineața s-a dus la piață și a cumpărat pâine proaspătă pentru familia ei",
           "trenul a întârziat din nou așa că am așteptat în gară aproape o oră",
           "fratele meu lucrează într-un magazin mic lângă podul vechi"],
    "hu": ["másnap reggel elment a piacra és friss kenyeret vett a családjának",
           "a vonat megint késett ezért majdnem egy órát vártunk az állomáson",
           "a bátyám egy kis boltban dolgozik a régi híd közelében"],
    "tr": ["ertesi sabah pazara gitti ve ailesi için taze ekmek aldı",
           "tren yine gecikti bu yüzden istasyonda neredeyse bir saat bekledik",
           "kardeşim eski köprünün yakınındaki küçük bir dükkanda çalışıyor"],
    "id": ["keesokan paginya dia pergi ke pasar dan membeli roti segar untuk keluarganya",
           "kereta terlambat lagi jadi kami menunggu di stasiun hampir satu jam",
           "kakak saya bekerja di sebuah toko kecil dekat jembatan tua"],
    "vi": ["sáng hôm sau cô ấy đi chợ và mua bánh mì tươi cho gia đình mình",
           "tàu lại đến muộn nên chúng tôi phải đợi ở nhà ga gần một tiếng",
           "anh trai tôi làm việc trong một cửa hàng nhỏ gần cây cầu cũ"],
    "ru": ["на следующее утро она пошла на рынок и купила свежий хлеб для своей семьи",
           "поезд снова опоздал поэтому мы ждали на вокзале почти час",
           "мой брат работает в маленьком магазине возле старого моста"],
    "uk": ["наступного ранку вона пішла на ринок і купила свіжий хліб для своєї родини",
           "потяг знову запізнився тому ми чекали на вокзалі майже годину",
           "мій брат працює в маленькій крамниці біля старого мосту"],
    "el": ["το επόμενο πρωί πήγε στην αγορά και αγόρασε φρέσκο ψωμί για την οικογένειά της",
           "το τρένο άργησε πάλι οπότε περιμέναμε στον σταθμό σχεδόν μία ώρα",
           "ο αδερφός μου δουλεύει σε ένα μικρό μαγαζί κοντά στην παλιά γέφυρα"],
    "ar": ["في صباح اليوم التالي ذهبت إلى السوق واشترت خبزا طازجا لعائلتها",
           "تأخر القطار مرة أخرى لذلك انتظرنا في المحطة قرابة ساعة",
           "يعمل أخي في متجر صغير بالقرب من الجسر القديم"],
    "he": ["למחרת בבוקר היא הלכה לשוק וקנתה לחם טרי למשפחתה",
           "הרכבת שוב איחרה אז חיכינו בתחנה כמעט שעה",
           "אחי עובד בחנות קטנה ליד הגשר הישן"],
    "hi": ["अगली सुबह वह बाजार गई और अपने परिवार के लिए ताजी रोटी खरीदी",
           "ट्रेन फिर से देर से आई इसलिए हम स्टेशन पर लगभग एक घंटा इंतजार करते रहे",
           "मेरा भाई पुराने पुल के पास एक छोटी दुकान में काम करता है"],
    "zh": ["第二天早上她去市场为家人买了新鲜的面包",
           "火车又晚点了所以我们在车站等了差不多一个小时",
           "我哥哥在老桥附近的一家小商店工作"],
    "ja": ["翌朝、彼女は市場へ行って家族のために新しいパンを買いました",
           "電車がまた遅れたので私たちは駅で一時間近く待ちました",
           "兄は古い橋の近くの小さな店で働いています"],
    "ko": ["다음 날 아침 그녀는 시장에 가서 가족을 위해 신선한 빵을 샀다",
           "기차가 또 늦어서 우리는 역에서 거의 한 시간을 기다렸다",
           "우리 형은 오래된 다리 근처의 작은 가게에서 일한다"],
}


@pytest.fixture(scope="module")
def model():
    from raqc_ray.ops.langid import TrigramLangId

    return TrigramLangId()


def test_fixture_sentences_not_in_seeds():
    from raqc_ray.ops.langid import _LANG_SEEDS

    for lg, sents in FIXTURE.items():
        for s in sents:
            assert s not in _LANG_SEEDS[lg]


def test_accuracy_gate(model):
    labels = [lg for lg, sents in FIXTURE.items() for _ in sents]
    texts = [s for sents in FIXTURE.values() for s in sents]
    pred = model.predict(texts)
    acc = float(np.mean(np.asarray(labels, dtype=object) == pred))
    wrong = [(l, p, t[:40]) for l, p, t in zip(labels, pred, texts) if l != p]
    assert acc >= 0.95, f"accuracy {acc:.3f}; wrong: {wrong}"


def test_covers_at_least_20_languages(model):
    assert len(model.langs) >= 20


def test_other_contract(model):
    assert model.predict_one("") == "other"
    assert model.predict_one("zzq xq jj 88 9 77") == "other"


def test_langid_ray_plumbing(ray_session):
    import ray.data as rd

    from raqc_ray.ops.text import LangId

    texts = [s for sents in FIXTURE.values() for s in sents]
    labels = [lg for lg, sents in FIXTURE.items() for _ in sents]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts, "lang": labels})
    out = (rd.from_pandas(df).repartition(4)
           .map_batches(LangId, batch_format="pandas", concurrency=2)
           .to_pandas().sort_values("doc_id"))
    acc = float((out["lang"] == out["lang_pred"]).mean())
    assert acc >= 0.95
    assert list(out.columns) == ["doc_id", "lang", "lang_pred"]

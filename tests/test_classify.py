"""NB-shape classifier: hand-built corpora pin training pruning,
integer scoring, tie-breaking, and empty-doc behavior."""

import numpy as np
import pyarrow as pa

from docling_ray.stages.classify import nb_classify, nb_score_texts, nb_train


def _corpus(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })


def test_disjoint_vocab_recovers_labels(ray_session):
    import ray

    rows = [(f"a{i}", "apple banana cherry", "en") for i in range(5)] + \
           [(f"b{i}", "pomme banane cerise", "fr") for i in range(5)]
    ds = ray.data.from_arrow(_corpus(rows))
    out = nb_classify(ds).to_pandas().set_index("doc_id")
    assert (out.loc[[f"a{i}" for i in range(5)], "pred"] == "en").all()
    assert (out.loc[[f"b{i}" for i in range(5)], "pred"] == "fr").all()
    assert (out["score"] > 0).all()


def test_min_count_prunes_hapax_and_ties_break_lex(ray_session):
    import ray

    # 'zzz' appears once in en (pruned, c<2); shared word 'the' appears
    # twice per class -> identical models -> tie -> lex-min class 'de'
    rows = [("d1", "the the zzz", "en"), ("d2", "the the", "de")]
    ds = ray.data.from_arrow(_corpus(rows))
    out = nb_classify(ds).to_pandas().set_index("doc_id")
    # both models are {the: 2}, total 2 -> every 'the' scores 1e6
    assert out.loc["d2", "pred"] == "de"
    assert out.loc["d2", "score"] == 2_000_000
    # d1: zzz contributes 0 (pruned); tie on 2e6 -> 'de' (lex-min)
    assert out.loc["d1", "pred"] == "de"
    assert out.loc["d1", "score"] == 2_000_000


def test_empty_doc_predicts_lexmin_at_zero(ray_session):
    import ray

    rows = [("e0", "", "en"), ("e1", "hola hola", "es"),
            ("e2", "hello hello", "en")]
    ds = ray.data.from_arrow(_corpus(rows))
    out = nb_classify(ds).to_pandas().set_index("doc_id")
    assert out.loc["e0", "pred"] == "en"  # lex-min of {en, es}
    assert out.loc["e0", "score"] == 0


def test_score_texts_matches_manual_arithmetic():
    # model: en {hello: 3, world: 2} total 5; fr {monde: 4} total 4
    from docling_ray.stages.text_quality import _gram_digest

    def mk(d):
        toks = sorted(d, key=lambda t: _gram_digest(t))
        dig = np.frombuffer(b"".join(_gram_digest(t) for t in toks),
                            dtype="S16")
        c = np.asarray([d[t] for t in toks], np.int64)
        return dig, c, int(c.sum())

    m = {"en": mk({"hello": 3, "world": 2}), "fr": mk({"monde": 4})}
    pred, s = nb_score_texts(m, ["hello world hello", "le monde", None])
    # en: 600000+400000+600000 = 1_600_000 ; fr: 0
    assert pred[0] == "en" and s[0] == 1_600_000
    # fr: monde -> 1_000_000 ; en: 0
    assert pred[1] == "fr" and s[1] == 1_000_000
    # None -> empty -> lex-min 'en', 0
    assert pred[2] == "en" and s[2] == 0


def test_topk_caps_model_size(ray_session):
    import ray

    # 30 distinct words each x2 in one class; topk=4 keeps only 4
    words = [f"w{i:02d}" for i in range(30)]
    rows = [("d1", " ".join(words), "en"), ("d2", " ".join(words), "en")]
    ds = ray.data.from_arrow(_corpus(rows))
    model = nb_train(ds, topk=4)
    keys, cnts, total = model["en"]
    assert len(keys) == 4 and total == 8  # 4 words x count 2


def test_classification_report_hand_confusion(ray_session):
    import ray

    from docling_ray.stages.classify import classification_report

    # predictions fixed by hand: en truth {tp 2, fn 1 (pred fr)},
    # fr truth {tp 1, fn 1 (pred en)}
    t = pa.table({
        "label": pa.array(["en", "en", "en", "fr", "fr"], pa.string()),
        "pred": pa.array(["en", "en", "fr", "fr", "en"], pa.string()),
    })
    rep = classification_report(ray.data.from_arrow(t)) \
        .to_pandas().set_index("label")
    # en: tp=2 fp=1 fn=1 -> precision 2/3, recall 2/3, f1 2*2/(4+2)
    assert rep.loc["en", ["tp", "fp", "fn"]].tolist() == [2, 1, 1]
    assert rep.loc["en", "precision_ppm"] == 2 * 1_000_000 // 3
    assert rep.loc["en", "recall_ppm"] == 2 * 1_000_000 // 3
    assert rep.loc["en", "f1_ppm"] == 4 * 1_000_000 // 6
    # fr: tp=1 fp=1 fn=1 -> 500000 across the board
    assert rep.loc["fr", ["tp", "fp", "fn"]].tolist() == [1, 1, 1]
    assert (rep.loc["fr", ["precision_ppm", "recall_ppm",
                           "f1_ppm"]] == 500_000).all()


def test_classification_report_absent_class_zero_division(ray_session):
    import ray

    from docling_ray.stages.classify import classification_report

    # class 'de' never predicted: tp=0, fp=0 -> precision 0 (no raise);
    # class 'en' never a true label: tp=0, fn=0 -> recall 0
    t = pa.table({
        "label": pa.array(["de", "de"], pa.string()),
        "pred": pa.array(["en", "en"], pa.string()),
    })
    rep = classification_report(ray.data.from_arrow(t)) \
        .to_pandas().set_index("label")
    assert rep.loc["de", ["tp", "fp", "fn"]].tolist() == [0, 0, 2]
    assert rep.loc["de", ["precision_ppm", "f1_ppm"]].tolist() == [0, 0]
    assert rep.loc["en", ["tp", "fp", "fn"]].tolist() == [0, 2, 0]
    assert rep.loc["en", ["recall_ppm", "f1_ppm"]].tolist() == [0, 0]

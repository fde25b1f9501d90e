

def test_cross_page_hyphen_merge_literal():
    """readingorder_model.py:589-621 parity: split word joins without the
    hyphen; furniture between the halves is skipped; uppercase
    continuations and non-text boundaries never merge."""
    from docling_ray.stages.assemble import merge_page_boundary

    prev = [("page_header", "H", ""), ("text", "runs the transfor-", ""),
            ("footnote", "1. note", ""), ("page_footer", "p1", "")]
    nxt = [("page_header", "H", ""), ("text", "mation step.", ""),
           ("text", "More.", "")]
    out = merge_page_boundary(prev, nxt)
    assert out is not None
    a, b = out
    assert a[1] == ("text", "runs the transformation step.", "")
    assert b == [("page_header", "H", ""), ("text", "More.", "")]
    # soft hyphen merges regardless of continuation case
    soft = merge_page_boundary([("text", "trans­", "")],
                               [("text", "Formation.", "")])
    assert soft is not None and soft[0][0][1] == "transFormation."
    # uppercase continuation after a hard hyphen: no merge
    assert merge_page_boundary([("text", "end-", "")],
                               [("text", "Start.", "")]) is None
    # non-text boundary: no merge
    assert merge_page_boundary([("table", "", "grid:{}")],
                               [("text", "mation", "")]) is None
    assert merge_page_boundary([("text", "plain text", "")],
                               [("text", "lower start", "")]) is None

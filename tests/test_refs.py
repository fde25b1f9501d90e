"""Hand-written literal expectations for functions/refs.py — the media_ref
serializations shared between the generator and the engine. Literal pins
(not round-trips) so a shared bug cannot hide from the selfcheck."""

from docling_ray.functions.refs import grid_media_ref


def test_grid_media_ref_literal():
    assert grid_media_ref([["a", "b"], ["c", "d"]]) == (
        'grid:{"num_rows":2,"num_cols":2,"cells":[["a","b"],["c","d"]]}'
    )


def test_grid_media_ref_empty_and_ragged_header():
    assert grid_media_ref([]) == 'grid:{"num_rows":0,"num_cols":0,"cells":[]}'
    # num_cols comes from the first row only (canonical grids are rectangular;
    # the serializer does not re-pad)
    assert grid_media_ref([["h1", "h2", "h3"]]) == (
        'grid:{"num_rows":1,"num_cols":3,"cells":[["h1","h2","h3"]]}'
    )


def test_grid_media_ref_escaping_and_unicode():
    # quotes escaped per JSON; non-ASCII kept raw (ensure_ascii=False)
    assert grid_media_ref([['say "hi"', "naïve"]]) == (
        'grid:{"num_rows":1,"num_cols":2,"cells":[["say \\"hi\\"","naïve"]]}'
    )
    # backslash + newline escapes
    assert grid_media_ref([["a\\b", "x\ny"]]) == (
        'grid:{"num_rows":1,"num_cols":2,"cells":[["a\\\\b","x\\ny"]]}'
    )

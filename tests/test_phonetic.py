"""American Soundex (stages/phonetic.py): classic reference vectors,
edge semantics, and the distinct-first dataset wrapper."""

import numpy as np
import pandas as pd

from horus_ner_ray.stages.phonetic import soundex_batch, soundex_dataset


def test_soundex_reference_vectors():
    cases = {
        "robert": "R163", "rupert": "R163", "ashcraft": "A261",
        "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
        "honeyman": "H555", "white": "W300", "a": "A000", "ae": "A000",
        "gauss": "G200", "ghosh": "G200", "hilbert": "H416",
        "heilbronn": "H416", "lloyd": "L300", "liu": "L000",
        "moses": "M220", "example": "E251",
    }
    got = soundex_batch(np.array(list(cases), dtype=object))
    assert list(got) == list(cases.values())


def test_soundex_edges():
    # empty, single h/w, digits dropped like h/w, leading digit head
    got = soundex_batch(np.array(["", "h", "w", "a1b2c", "9bc"],
                                 dtype=object))
    assert list(got) == ["", "H000", "W000", "A120", "9120"]


def test_soundex_dataset(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"k": ["robert", "rupert", "robert", "lloyd"] * 5})
    out = (soundex_dataset(rd.from_pandas(df).repartition(3), "k")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out["k"]) == ["lloyd", "robert", "rupert"]  # distinct
    assert list(out["soundex"]) == ["L300", "R163", "R163"]

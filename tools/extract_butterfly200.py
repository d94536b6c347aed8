"""One-time extraction of the Butterfly200 taxonomy DATA from the reference
(`/root/reference/data/db.py:17-1115` carries the 5/23/116/200 label maps as
literal dicts inside `Butterfly200LabelMap.__init__`).

The taxonomy itself is factual species data, not code; this tool parses the
dict literals with `ast` (no reference code is executed or copied) and
freezes them as `learning_embeddings_tpu/data/butterfly200_taxonomy.json`:

    {"levels": {"family": [names in reference index order], ...},
     "child_of": {"family": {parent: [children]}, ...}}

Run:  python tools/extract_butterfly200.py
"""

import ast
import json
import os

REF = "/root/reference/data/db.py"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "learning_embeddings_tpu", "data",
                   "butterfly200_taxonomy.json")

WANT = ("family", "subfamily", "genus", "genus_specific_epithet",
        "child_of_family", "child_of_subfamily", "child_of_genus")


def main():
    tree = ast.parse(open(REF).read())
    cls = next(n for n in tree.body
               if isinstance(n, ast.ClassDef)
               and n.name == "Butterfly200LabelMap")
    init = next(n for n in cls.body
                if isinstance(n, ast.FunctionDef) and n.name == "__init__")
    found = {}
    for stmt in init.body:
        if (isinstance(stmt, ast.Assign) and len(stmt.targets) == 1
                and isinstance(stmt.targets[0], ast.Attribute)
                and stmt.targets[0].attr in WANT
                and isinstance(stmt.value, ast.Dict)):
            found[stmt.targets[0].attr] = ast.literal_eval(stmt.value)
    missing = set(WANT) - set(found)
    assert not missing, f"missing {missing}"

    def ordered_names(d):
        # name -> index dicts; freeze names in reference index order
        return [name for name, _ in sorted(d.items(), key=lambda kv: kv[1])]

    payload = {
        "source": "ankitdhall/learning_embeddings data/db.py:17-1115 "
                  "(Butterfly200LabelMap literals; taxonomy data, not code)",
        "levels": {
            "family": ordered_names(found["family"]),
            "subfamily": ordered_names(found["subfamily"]),
            "genus": ordered_names(found["genus"]),
            "genus_specific_epithet":
                ordered_names(found["genus_specific_epithet"]),
        },
        "child_of": {
            "family": found["child_of_family"],
            "subfamily": found["child_of_subfamily"],
            "genus": found["child_of_genus"],
        },
    }
    sizes = [len(v) for v in payload["levels"].values()]
    print("level sizes:", sizes)
    assert sizes == [5, 23, 116, 200], sizes
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", os.path.normpath(OUT))


if __name__ == "__main__":
    main()

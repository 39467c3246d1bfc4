"""SAM header model.

Keeps the raw header text verbatim (byte-parity with the reference requires
never reformatting lines we did not modify — htslib's sam_hdr preserves text
the same way) plus a parsed view of @SQ (name, length) for tid lookup.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class SamHeader:
    text: str = ""
    ref_names: list[str] = field(default_factory=list)
    ref_lens: list[int] = field(default_factory=list)
    _name2tid: dict[str, int] = field(default_factory=dict)

    # ------------------------------------------------------------- creation
    @classmethod
    def from_text(cls, text: str, ref_names: list[str] | None = None,
                  ref_lens: list[int] | None = None) -> "SamHeader":
        """Parse header text; if BAM binary ref list given, it is
        authoritative for tids (text @SQ may be absent or differ)."""
        h = cls(text=text)
        if ref_names is not None:
            h.ref_names = list(ref_names)
            h.ref_lens = list(ref_lens or [0] * len(ref_names))
        else:
            for line in text.splitlines():
                if line.startswith("@SQ"):
                    name, ln = None, 0
                    for f in line.split("\t")[1:]:
                        if f.startswith("SN:"):
                            name = f[3:]
                        elif f.startswith("LN:"):
                            try:
                                ln = int(f[3:])
                            except ValueError:
                                ln = 0
                    if name is not None:
                        h.ref_names.append(name)
                        h.ref_lens.append(ln)
        h._name2tid = {n: i for i, n in enumerate(h.ref_names)}
        # @SQ AN: alternative names resolve to the same tid (htslib
        # sam_hdr_name2tid alias behavior); primaries take precedence
        for line in text.splitlines():
            if not line.startswith("@SQ"):
                continue
            name = None
            alts = []
            for f2 in line.split("\t")[1:]:
                if f2.startswith("SN:"):
                    name = f2[3:]
                elif f2.startswith("AN:"):
                    alts = f2[3:].split(",")
            if name is not None and name in h._name2tid:
                tid = h._name2tid[name]
                for a in alts:
                    h._name2tid.setdefault(a, tid)
        return h

    # --------------------------------------------------------------- access
    @property
    def n_refs(self) -> int:
        return len(self.ref_names)

    def tid(self, name: str) -> int:
        return self._name2tid.get(name, -1)

    def ref_name(self, tid: int) -> str:
        return self.ref_names[tid] if 0 <= tid < len(self.ref_names) else "*"

    def lines(self) -> list[str]:
        return [l for l in self.text.split("\n") if l]

    def find_tag_values(self, rec_type: str, tag: str) -> list[str]:
        """All values of `tag` across header lines of @rec_type."""
        out = []
        for line in self.lines():
            if line.startswith("@" + rec_type):
                for f in line.split("\t")[1:]:
                    if f.startswith(tag + ":"):
                        out.append(f[len(tag) + 1:])
        return out

    def rg_ids(self) -> list[str]:
        return self.find_tag_values("RG", "ID")

    def rg_to_sample(self) -> dict[str, str]:
        """RG ID -> SM map (reference: sample.c bam_smpl_add)."""
        out = {}
        for line in self.lines():
            if line.startswith("@RG"):
                rid, sm = None, None
                for f in line.split("\t")[1:]:
                    if f.startswith("ID:"):
                        rid = f[3:]
                    elif f.startswith("SM:"):
                        sm = f[3:]
                if rid is not None:
                    out[rid] = sm if sm is not None else rid
        return out

    def sort_order(self) -> str:
        m = re.search(r"^@HD\t.*\bSO:(\S+)", self.text, re.M)
        return m.group(1) if m else "unknown"

    # ------------------------------------------------------------- mutation
    def with_text(self, text: str) -> "SamHeader":
        return SamHeader.from_text(text, self.ref_names or None,
                                   self.ref_lens or None)

    def ensure_hd_so(self, so: str, subsort: str | None = None) -> "SamHeader":
        """Set/replace @HD SO: (and optional SS:) keeping other fields.

        Reference behavior: bam_sort.c set_sort_order stamps the header's @HD
        line with the new sort order.
        """
        lines = self.text.split("\n")
        hd = None
        for i, line in enumerate(lines):
            if line.startswith("@HD"):
                hd = i
                break
        so_field = f"SO:{so}"
        ss_field = f"SS:{subsort}" if subsort else None
        if hd is None:
            fields = ["@HD", "VN:1.6", so_field]
            if ss_field:
                fields.append(ss_field)
            new_lines = ["\t".join(fields)] + lines
        else:
            fields = [f for f in lines[hd].split("\t")
                      if not (f.startswith("SO:") or f.startswith("SS:"))]
            fields.append(so_field)
            if ss_field:
                fields.append(ss_field)
            lines[hd] = "\t".join(fields)
            new_lines = lines
        text = "\n".join(new_lines)
        return SamHeader.from_text(text, self.ref_names or None,
                                   self.ref_lens or None)

    def add_pg_line(self, id_: str, pn: str, cl: str, vn: str) -> "SamHeader":
        """Append a @PG line chaining PP to the last existing @PG ID."""
        existing = self.find_tag_values("PG", "ID")
        uid = id_
        k = 1
        while uid in existing:
            uid = f"{id_}.{k}"
            k += 1
        pp = existing[-1] if existing else None
        line = f"@PG\tID:{uid}\tPN:{pn}"
        if pp:
            line += f"\tPP:{pp}"
        line += f"\tVN:{vn}\tCL:{cl}"
        text = self.text
        if text and not text.endswith("\n"):
            text += "\n"
        text += line + "\n"
        return SamHeader.from_text(text, self.ref_names or None,
                                   self.ref_lens or None)

"""TS->JS stripper for the reference sources.

Produces runnable .mjs versions of /root/reference/src/*.ts so the test
suite can differentially fuzz this engine against the REAL reference under
Node (tests/test_reference_differential.py).  Output goes to a scratch dir;
nothing from the reference is committed."""
import re
import sys


def remove_type_decls(src):
    lines = src.splitlines(); out = []; skipping = False
    for line in lines:
        if skipping:
            if re.match(r'^(import|export\s+(const|function)|const|let|function|export\s+\{)', line):
                skipping = False
            else:
                continue
        if re.match(r'^\s*(export\s+)?(declare\s+)?type\s+\w+', line):
            skipping = True; continue
        out.append(line)
    return '\n'.join(out)


TYPE_START = re.compile(r"^(any\b|string\b|number\b|boolean\b|void\b|null\b|undefined\b|[A-Z]|\{|\(|validateFn\b)")


def strip_annotations(src):
    i, n, out = 0, len(src), []
    while i < n:
        c = src[i]
        if c in '\'"`':
            q = c; out.append(c); i += 1
            while i < n:
                out.append(src[i])
                if src[i] == '\\' and i+1 < n: out.append(src[i+1]); i += 2; continue
                if src[i] == q: i += 1; break
                i += 1
            continue
        if c == '/' and i+1 < n and src[i+1] == '/':
            j = src.find('\n', i); j = n if j < 0 else j
            out.append(src[i:j]); i = j; continue
        if c == ':':
            prev_all = ''.join(out).rstrip()
            prev = prev_all[-1] if prev_all else ''
            attached = prev.isalnum() or prev in '_)?'
            if attached:
                m = re.match(r':\s*(\S.*)', src[i:], re.S)
                if m and TYPE_START.match(m.group(1)):
                    j = i + 1
                    while j < n and src[j].isspace():
                        j += 1
                    depth = 0
                    while j < n:
                        ch = src[j]
                        if ch in '{[<(': depth += 1
                        elif ch in '}]>)':
                            if depth == 0: break
                            depth -= 1
                        elif depth == 0:
                            if ch in ',;\n': break
                            if ch == '=' and j+1 < n and src[j+1] == '>':
                                if src[i+1:j].strip().endswith(')'):
                                    j += 2; continue
                                break
                            if ch == '=': break
                        j += 1
                    i = j; continue
        out.append(c); i += 1
    return ''.join(out)


def strip_ts(path):
    s = open(path).read()
    s = remove_type_decls(s)
    s = re.sub(r':\s*tbd is [\w<>\[\]| ]+', '', s)
    s = re.sub(r'=\s*<T>\s*\(', '= (', s)
    s = strip_annotations(s)
    s = re.sub(r'\s+as\s+[A-Za-z_][\w.<>\[\]|]*', '', s)
    s = re.sub(r'\?(?=\s*[,)])', '', s)
    s = re.sub(r'\)\s*\n\s*=>', ') =>', s)
    return s


def keep_only_value_imports(src):
    def fix(m):
        names = [x.strip() for x in m.group(1).split(',')]
        keep = [x for x in names if x.strip().startswith('is') or x.strip() in
                ('validate', 'loadJson', 'combineValidationObjects', 'generate', 'randomNumber', 'validationToType')]
        return 'import {\n  ' + ', '.join(keep) + '\n}'
    return re.sub(r'import \{([^}]*)\}', fix, src)


def strip_to(out_dir, names=("validationTypes", "validate", "type"),
             src_dir="/root/reference/src"):
    import os
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        s = strip_ts(f'{src_dir}/{name}.ts')
        s = s.replace('./validationTypes.js', './validationTypes.mjs')
        s = s.replace('./validate.js', './validate.mjs')
        s = keep_only_value_imports(s)
        open(f'{out_dir}/{name}.mjs', 'w').write(s)


if __name__ == '__main__':
    strip_to(sys.argv[1] if len(sys.argv) > 1 else '/tmp/refjs')
    print('ok')

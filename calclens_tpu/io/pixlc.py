"""pixLC lens-plane format (reference read_lensplanes_pixLC.c:13-25).

One binary file per (plane, file-cell): <path>/<name>_<plane>_<nestindex>,
little-endian packed:
  header (C struct, natural alignment, 64 bytes):
    u8 npart, u4 indexnside, u4 filenside, f4 rmin, f4 rmax, u8 npartrad,
    f4 boxsize, (pad) f8 mass [1e10 Msun/h], f8 omega0, f8 omegalambda,
    f8 hubbleparam
  long[12*indexnside^2] per-cell index (skipped by the reader)
  float[3*npart] positions (Mpc/h)
All particles in a file share head.mass * 1e10 Msun/h.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..healpix import core as hp

# C struct layout with natural alignment (x86-64): offsets
#   0 npart(Q) 8 indexnside(I) 12 filenside(I) 16 rmin(f) 20 rmax(f)
#   24 npartrad(Q) 32 boxsize(f) +4 pad 40 mass(d) 48 omega0(d)
#   56 omegalambda(d) 64 hubbleparam(d) -> size 72
_HEADER = struct.Struct("<QIIffQf4xdddd")
HEADER_SIZE = _HEADER.size


def write_header(npart, indexnside, filenside, rmin, rmax, npartrad,
                 boxsize, mass_1e10, omega0, omegal, hubble):
    return _HEADER.pack(npart, indexnside, filenside, rmin, rmax, npartrad,
                        boxsize, mass_1e10, omega0, omegal, hubble)


def cell_filename(path, name, plane_num, nest):
    return os.path.join(path, f"{name}_{plane_num}_{nest}")


def write_cell(path, name, plane_num, nest, pos, mass_1e10,
               indexnside=1, filenside=1, rmin=0.0, rmax=0.0,
               boxsize=0.0, omega0=0.3, omegal=0.7, hubble=0.7):
    """Test/production writer for one pixLC cell file."""
    pos = np.asarray(pos, np.float32).reshape(-1, 3)
    npix_idx = 12 * indexnside * indexnside
    with open(cell_filename(path, name, plane_num, nest), "wb") as fp:
        fp.write(write_header(len(pos), indexnside, filenside, rmin, rmax,
                              len(pos), boxsize, mass_1e10, omega0, omegal,
                              hubble))
        fp.write(np.zeros(npix_idx, dtype="<i8").tobytes())
        fp.write(pos.astype("<f4").tobytes())


def read_header(filename):
    with open(filename, "rb") as fp:
        raw = fp.read(HEADER_SIZE)
    (npart, indexnside, filenside, rmin, rmax, npartrad, boxsize,
     mass, omega0, omegal, hubble) = _HEADER.unpack(raw)
    return dict(npart=npart, indexnside=indexnside, filenside=filenside,
                rmin=rmin, rmax=rmax, npartrad=npartrad, boxsize=boxsize,
                mass=mass, omega0=omega0, omegal=omegal, hubble=hubble)


def read_plane(path, name, plane_num, peano_cells=None, read_order=None):
    """Read particles for one plane: (pos [N,3] f8, mass [N] f8 in Msun/h).

    peano_cells/read_order restrict to the overlap with the file's cell
    order (read_lensplanes_pixLC.c peano culling); None reads all cells.
    """
    file_order = None
    probe = None
    for fn in os.listdir(path):
        if fn.startswith(f"{name}_{plane_num}_"):
            probe = os.path.join(path, fn)
            break
    if probe is None:
        return np.zeros((0, 3)), np.zeros(0)
    hd = read_header(probe)
    file_order = int(np.log2(hd["filenside"])) if hd["filenside"] > 1 else 0

    if peano_cells is not None:
        from .lensplanes import _file_cells_for

        ro = file_order if read_order is None else int(read_order)
        want_peano = _file_cells_for(peano_cells, ro, file_order)
        nests = hp.peano2nest(np.asarray(sorted(want_peano), np.int64),
                              file_order)
    else:
        nests = np.arange(int(hp.order2npix(file_order)), dtype=np.int64)

    pos_list, mass_list = [], []
    for nest in nests:
        fn = cell_filename(path, name, plane_num, int(nest))
        if not os.path.exists(fn):
            continue
        hd = read_header(fn)
        if hd["npart"] == 0:
            continue
        with open(fn, "rb") as fp:
            fp.seek(HEADER_SIZE + 8 * 12 * hd["indexnside"] ** 2)
            pos = np.frombuffer(fp.read(12 * hd["npart"]), dtype="<f4")
        pos = pos.reshape(-1, 3).astype(np.float64)
        pos_list.append(pos)
        mass_list.append(np.full(len(pos), hd["mass"] * 1e10))
    if not pos_list:
        return np.zeros((0, 3)), np.zeros(0)
    return np.concatenate(pos_list), np.concatenate(mass_list)

// Native host-runtime helpers for edyn_tpu.
//
// The reference engine is entirely C++ (SURVEY: ~42k LoC C++17). In the TPU
// rebuild the hot simulation path is XLA-compiled; what remains
// performance-sensitive on the HOST is scene/asset preprocessing — trimesh
// topology (edge adjacency), candidate-grid baking, OBJ parsing — which runs
// at world-build and terrain-page-load time (reference analogues:
// triangle_mesh::initialize, static_tree build, util/shape_io OBJ loading).
// These are implemented here as a plain C ABI consumed via ctypes
// (edyn_tpu/native/loader.py); Python fallbacks exist for every entry point.
//
// Build: make -C csrc   (produces libedyn_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Edge-adjacent normals: for each triangle edge, the neighboring triangle's
// normal (own normal when boundary). Reference analogue:
// triangle_mesh adjacency used for Voronoi-region edge rejection.
// indices: [T,3] int64, normals: [T,3] f64, out: [T,3,3] f64 (pre-filled with
// own normals).
// ---------------------------------------------------------------------------
void edyn_adjacent_normals(const int64_t* indices, long T,
                           const double* normals, double* out) {
    std::unordered_map<uint64_t, std::pair<long, int>> edge_owner;
    edge_owner.reserve(static_cast<size_t>(T) * 3);
    for (long t = 0; t < T; ++t) {
        for (int e = 0; e < 3; ++e) {
            int64_t a = indices[t * 3 + e];
            int64_t b = indices[t * 3 + (e + 1) % 3];
            uint64_t lo = static_cast<uint64_t>(a < b ? a : b);
            uint64_t hi = static_cast<uint64_t>(a < b ? b : a);
            uint64_t key = (lo << 32) | hi;
            auto it = edge_owner.find(key);
            if (it == edge_owner.end()) {
                edge_owner.emplace(key, std::make_pair(t, e));
            } else {
                long t2 = it->second.first;
                int e2 = it->second.second;
                for (int k = 0; k < 3; ++k) {
                    out[(t * 3 + e) * 3 + k] = normals[t2 * 3 + k];
                    out[(t2 * 3 + e2) * 3 + k] = normals[t * 3 + k];
                }
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Candidate-grid baking: register every triangle (inflated by margin) into
// each overlapped cell of a 2D grid over axes (ax0, ax1). Replaces the
// reference's static_tree median-split build for the mesh candidate lookup.
// tv: [T,3,3] f64; grid_out: [gx,gy,cap] int32 pre-filled -1;
// counts_out: [gx,gy] int32 zeroed. Returns max overflow (entries dropped in
// the fullest cell).
// ---------------------------------------------------------------------------
long edyn_bake_grid(const double* tv, long T, int ax0, int ax1,
                    double origin0, double origin1, double cell_size,
                    double margin, int gx, int gy, int cap,
                    int32_t* grid_out, int32_t* counts_out) {
    long overflow = 0;
    for (long t = 0; t < T; ++t) {
        double lo0 = 1e300, hi0 = -1e300, lo1 = 1e300, hi1 = -1e300;
        for (int v = 0; v < 3; ++v) {
            double c0 = tv[(t * 3 + v) * 3 + ax0];
            double c1 = tv[(t * 3 + v) * 3 + ax1];
            if (c0 < lo0) lo0 = c0;
            if (c0 > hi0) hi0 = c0;
            if (c1 < lo1) lo1 = c1;
            if (c1 > hi1) hi1 = c1;
        }
        int x0 = static_cast<int>((lo0 - margin - origin0) / cell_size);
        int x1 = static_cast<int>((hi0 + margin - origin0) / cell_size);
        int y0 = static_cast<int>((lo1 - margin - origin1) / cell_size);
        int y1 = static_cast<int>((hi1 + margin - origin1) / cell_size);
        if (x0 < 0) x0 = 0;
        if (y0 < 0) y0 = 0;
        if (x1 >= gx) x1 = gx - 1;
        if (y1 >= gy) y1 = gy - 1;
        for (int cx = x0; cx <= x1; ++cx) {
            for (int cy = y0; cy <= y1; ++cy) {
                int32_t& n = counts_out[cx * gy + cy];
                if (n < cap) {
                    grid_out[(cx * gy + cy) * cap + n] = static_cast<int32_t>(t);
                    ++n;
                } else {
                    ++overflow;
                }
            }
        }
    }
    return overflow;
}

// ---------------------------------------------------------------------------
// OBJ parsing (reference: util/shape_io.cpp load_tri_mesh_from_obj incl.
// per-vertex colors as materials). Two-pass C parser: call with
// verts=faces=colors=nullptr to count, then with buffers.
// Returns 0 on success, -1 on file error.
// verts: [nv,3] f64; colors: [nv,3] f64 (1.0 default); faces: [nf,3] int64
// (triangulated fan for polygons).
// ---------------------------------------------------------------------------
int edyn_parse_obj(const char* path, long* nv_out, long* nf_out,
                   double* verts, double* colors, int64_t* faces) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char line[4096];
    long nv = 0, nf = 0;
    const bool counting = (verts == nullptr);
    while (fgets(line, sizeof line, f)) {
        if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
            if (!counting) {
                double x = 0, y = 0, z = 0, r = 1, g = 1, b = 1;
                int n = sscanf(line + 2, "%lf %lf %lf %lf %lf %lf",
                               &x, &y, &z, &r, &g, &b);
                verts[nv * 3 + 0] = x;
                verts[nv * 3 + 1] = y;
                verts[nv * 3 + 2] = z;
                if (colors) {
                    colors[nv * 3 + 0] = (n >= 6) ? r : 1.0;
                    colors[nv * 3 + 1] = (n >= 6) ? g : 1.0;
                    colors[nv * 3 + 2] = (n >= 6) ? b : 1.0;
                }
            }
            ++nv;
        } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
            // collect vertex indices (ignore /vt/vn), triangulate as a fan
            std::vector<long> idx;
            char* p = line + 2;
            while (*p) {
                while (*p == ' ' || *p == '\t') ++p;
                if (*p == '\0' || *p == '\n' || *p == '\r') break;
                long v = strtol(p, &p, 10);
                if (v < 0) v = nv + v; else v -= 1;  // OBJ is 1-based
                idx.push_back(v);
                while (*p && *p != ' ' && *p != '\t' && *p != '\n') ++p;
            }
            for (size_t k = 2; k < idx.size(); ++k) {
                if (!counting) {
                    faces[nf * 3 + 0] = idx[0];
                    faces[nf * 3 + 1] = idx[k - 1];
                    faces[nf * 3 + 2] = idx[k];
                }
                ++nf;
            }
        }
    }
    fclose(f);
    *nv_out = nv;
    *nf_out = nf;
    return 0;
}

// ---------------------------------------------------------------------------
// Batched binary snapshot framing for the networking layer: delta-encode an
// int32 entity array (reference analogue: pool_snapshot entity index arrays).
// Simple varint encoding; returns bytes written (or needed if out == null).
// ---------------------------------------------------------------------------
long edyn_varint_encode_deltas(const int32_t* values, long n, uint8_t* out) {
    long pos = 0;
    int32_t prev = 0;
    for (long i = 0; i < n; ++i) {
        uint32_t zz;
        int32_t d = values[i] - prev;
        prev = values[i];
        zz = (static_cast<uint32_t>(d) << 1) ^ static_cast<uint32_t>(d >> 31);
        do {
            uint8_t byte = zz & 0x7F;
            zz >>= 7;
            if (zz) byte |= 0x80;
            if (out) out[pos] = byte;
            ++pos;
        } while (zz);
    }
    return pos;
}

long edyn_varint_decode_deltas(const uint8_t* data, long nbytes,
                               int32_t* out, long max_out) {
    long pos = 0, n = 0;
    int32_t prev = 0;
    while (pos < nbytes && n < max_out) {
        uint32_t zz = 0;
        int shift = 0;
        while (pos < nbytes) {
            uint8_t byte = data[pos++];
            zz |= static_cast<uint32_t>(byte & 0x7F) << shift;
            shift += 7;
            if (!(byte & 0x80)) break;
        }
        int32_t d = static_cast<int32_t>((zz >> 1) ^ (~(zz & 1) + 1));
        prev += d;
        out[n++] = prev;
    }
    return n;
}

}  // extern "C"

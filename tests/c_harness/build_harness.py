"""Build a single-frame golden-image dumper from the reference C source.

The reference (read-only at /root/reference) has no library API — `main()`
hard-codes the scene and runs an infinite terminal loop. For golden tests
we compile the reference's OWN code (never copied into this repo) into a
one-frame renderer:

  1. read /root/reference/TerminalRayTracer.c
  2. patch it minimally IN A TEMP DIR: rename main(), make the resolution/
     spp/bounce #defines overridable from the compile line
  3. compile it together with a small driver (driver.c, our code) that
     builds the demo scene exactly as the reference main does
     (TerminalRayTracer.c:1256-1306), computes the orbit camera for a given
     t (TerminalRayTracer.c:1326-1336) using the reference's own frame
     functions, calls project_scene once, and fwrites the raw double
     framebuffer.

Run the binary with cwd=/root/reference so the reference's relative
`skybox/<name>/...` asset paths resolve (TerminalRayTracer.c:403).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from pathlib import Path

REFERENCE_C = "/root/reference/TerminalRayTracer.c"

DRIVER_C = r"""
/* Golden-frame driver: renders ONE reference frame at time t and dumps the
 * double framebuffer. Scene constants mirror the reference demo
 * (TerminalRayTracer.c:1256-1306). */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define main reference_main_disabled
#include PATCHED_REFERENCE
#undef main

int main(int argc, char **argv)
{
    if (argc != 4) {
        fprintf(stderr, "usage: %s <t> <skybox_name> <out.bin>\n", argv[0]);
        return 2;
    }
    double t = atof(argv[1]);
    char *skybox_name = argv[2];
    char *out_path = argv[3];

    load_skybox(&global_skybox, skybox_name);

    Sphere spheres[] = {
        {.center = {1.0, 0.0, 0.0}, .material = {.color = {1.0, 0.0, 0.0}, .reflectivity = 1.0, .specularity = 100.0}, .radius = 0.5},
        {.center = {0.0, 1.0, 0.0}, .material = {.color = {0.0, 1.0, 0.0}, .reflectivity = 0.8, .specularity = 100.0}, .radius = 0.5},
        {.center = {0.0, 0.0, 1.0}, .material = {.color = {0.0, 0.0, 1.0}, .reflectivity = 0.8, .specularity = 100.0}, .radius = 0.5},
        {.center = {-1.0, 0.0, 0.0}, .material = {.color = {0.0, 1.0, 1.0}, .reflectivity = 0.8, .specularity = 100.0}, .radius = 0.5},
        {.center = {0.0, -1.0, 0.0}, .material = {.color = {1.0, 0.0, 1.0}, .reflectivity = 0.8, .specularity = 100.0}, .radius = 0.5},
        {.center = {0.0, 0.0, -1.0}, .material = {.color = {1.0, 1.0, 0.0}, .reflectivity = 0.8, .specularity = 100.0}, .radius = 0.5},
    };
    Plane ground = {
        .normal = {0.0, 1.0, 0.0},
        .point = {0.0, -2.0, 0.0},
        .even_material = {.color = {1.0, 1.0, 1.0}, .reflectivity = 0.2, .specularity = 100.0},
        .odd_material = {.color = {1.0, 0.0, 0.0}, .reflectivity = 0.2, .specularity = 100.0},
    };
    DirectionalLight directional_lights[] = {{
        .direction = {-1.0, -1.0, -1.0}, .color = {1.0, 1.0, 1.0},
    }};
    PointLight point_lights[] = {{
        .position = {0.0, 0.0, 0.0}, .color = {1.0, 1.0, 1.0}, .intensity = 10.0,
    }};

    Camera camera;
    init_camera(&camera);

    Scene scene = {
        .camera = camera,
        .spheres = spheres,
        .num_spheres = 6,
        .ground = ground,
        .directional_lights = directional_lights,
        .num_directional_lights = 1,
        .point_lights = point_lights,
        .num_point_lights = 1,
        .skybox = global_skybox,
    };

    /* orbit camera at time t (TerminalRayTracer.c:1326-1336) */
    Frame tf0, tf1;
    init_frame(&tf0);
    init_frame(&tf1);
    init_frame(&scene.camera.frame);
    rotate_basis_x(&tf0.basis, 2.0 * PI * t * -0.03);
    rotate_basis_y(&tf0.basis, 2.0 * PI * t * 0.05);
    Vector root_to_camera = {0.0, 0.0, 1.99};
    add_vectors((Vector *)&tf1.origin, &root_to_camera);
    transform_frame(&scene.camera.frame, &tf1);
    transform_frame(&scene.camera.frame, &tf0);

    static Vector pixels[SCREEN_HEIGHT * SCREEN_WIDTH];
    Screen screen = {.pixels = pixels, .width = SCREEN_WIDTH, .height = SCREEN_HEIGHT};

    project_scene(&scene, &screen);

    FILE *f = fopen(out_path, "wb");
    if (!f) { perror("fopen"); return 1; }
    fwrite(pixels, sizeof(Vector), SCREEN_HEIGHT * SCREEN_WIDTH, f);
    fclose(f);
    free_skybox(&global_skybox);
    return 0;
}
"""

_GUARDED_DEFINES = ("SCREEN_WIDTH", "SCREEN_HEIGHT", "RAYS_PER_PIXEL", "BOUNCE_LIMIT")


def patch_reference(src: str) -> str:
    """Minimal textual patches: guard config #defines, disable main."""
    out = []
    for line in src.splitlines(keepends=True):
        stripped = line.strip()
        matched = False
        for name in _GUARDED_DEFINES:
            if stripped.startswith(f"#define {name} ") or stripped == f"#define {name}":
                out.append(f"#ifndef {name}\n{line}#endif\n")
                matched = True
                break
        if matched:
            continue
        if stripped.startswith("int main()"):
            line = line.replace("int main()", "int reference_main(void)")
        out.append(line)
    return "".join(out)


def build(
    build_dir: str,
    width: int,
    height: int,
    spp: int,
    bounces: int,
    cc: str = "gcc",
) -> str:
    """Compile the golden dumper; returns the binary path. Raises
    CalledProcessError on compile failure (tests skip on that)."""
    build_dir = Path(build_dir)
    build_dir.mkdir(parents=True, exist_ok=True)
    patched = build_dir / "reference_patched.c"
    patched.write_text(patch_reference(Path(REFERENCE_C).read_text()))
    driver = build_dir / "driver.c"
    driver.write_text(DRIVER_C)
    binary = build_dir / f"golden_{width}x{height}x{spp}b{bounces}"
    cmd = [
        cc, "-O2", "-o", str(binary), str(driver),
        f"-DPATCHED_REFERENCE=\"{patched}\"",
        f"-DSCREEN_WIDTH={width}", f"-DSCREEN_HEIGHT={height}",
        f"-DRAYS_PER_PIXEL={spp}", f"-DBOUNCE_LIMIT={bounces}",
        "-lm",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return str(binary)


def run(binary: str, t: float, skybox_name: str, out_path: str) -> None:
    """Run with cwd=/root/reference so relative skybox paths resolve."""
    subprocess.run(
        [binary, "%.17g" % t, skybox_name, out_path],
        check=True,
        cwd="/root/reference",
        capture_output=True,
    )

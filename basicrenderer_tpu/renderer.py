"""Top-level Renderer: the user-facing orchestration class.

Mirrors the reference's Renderer surface (reference:
BasicRenderer/include/Renderer.h:73-89 — Initialize/OnResize/Update/Render/
SetCurrentScene/SetEnvironment/Cleanup) reshaped for TPU execution:

- `Initialize` -> constructor (settings + registries + frame-program cache).
- `Update`     -> host-side scene sync: propagate transforms, snapshot
  object matrices/lights into device buffers (SceneRenderBridge).
- `Render`     -> dispatch the jitted frame program; returns device arrays
  without blocking (XLA async dispatch = the reference's frames-in-flight,
  Renderer.cpp:1715-1722). Call `np.asarray(...)` on an output to sync.
- Structural settings changes swap in a new FrameConfig -> new jit
  specialization (the reference's render-graph rebuild, Renderer.cpp:1794).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import numpy as np
import jax

from .graph.frame import FrameProgramCache, build_frame_fn
from .graph.framedata import FrameConfig, FrameParams, SceneBuffers, make_view
from .models.materials import MaterialRegistry
from .models.mesh import MeshRegistry
from .scene.bridge import BridgeCapacities, SceneRenderBridge
from .scene.scene import Scene
from .models.voxels import static_level_offsets as _vox_offsets
from .utils.settings import SettingsManager, make_default_settings


class Renderer:
    def __init__(self, settings: Optional[SettingsManager] = None,
                 caps: Optional[BridgeCapacities] = None):
        from .utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()  # ShaderArtifactCache analogue (#8)
        self.settings = settings or make_default_settings()
        self.meshes = MeshRegistry()
        self.materials = MaterialRegistry()
        from .models.animation import SkeletonRegistry
        from .models.textures import TextureRegistry
        from .utils.telemetry import FrameTelemetry
        self.skeletons = SkeletonRegistry()
        from .models.texprocess import ProcessedTextureCache
        self.textures = TextureRegistry(processed_cache=ProcessedTextureCache(
            os.path.expanduser("~/.cache/basicrenderer_tpu/textures")))
        self.telemetry = FrameTelemetry()
        self._time = 0.0
        self.caps = caps or BridgeCapacities()
        self._programs = FrameProgramCache()
        self._scene: Optional[Scene] = None
        self._bridge: Optional[SceneRenderBridge] = None
        self._buffers: Optional[SceneBuffers] = None
        self._frame_index = 0
        self._settings_generation = -1
        self._config: Optional[FrameConfig] = None
        # Scene-update <-> render overlap (reference: the worker-thread
        # snapshot pipeline, Renderer.cpp:597-741, 1755-1769).
        self._update_pool = None
        self._update_future = None
        self._overlap_camera = None   # (view, proj, cam_pos) at commit
        self._overlap_mats = None     # committed object matrices (np)

    # -- scene management --------------------------------------------------
    def set_current_scene(self, scene: Scene) -> None:
        self._scene = scene
        self._bridge = SceneRenderBridge(
            scene, self.meshes, self.materials, self.caps,
            skeletons=self.skeletons, textures=self.textures,
            tex_format=self.settings.get("textureFormat", "rgba8"))
        if self.settings.get("textureFormat") == "bc3" and \
                self.settings.get("enableTextureStreaming"):
            raise ValueError(
                "textureFormat=bc3 + enableTextureStreaming is not "
                "supported yet: the texstream container streams RGBA8 "
                "strip rows")
        if len(self.textures):
            self.settings.set("enableTextures", True)
        self._buffers = None  # force geometry re-upload
        # Virtualized geometry: the cluster path MUST run when any mesh
        # carries a LOD DAG (all levels are resident in the soup) or any
        # mesh is instanced more than once (geometry is shared; per-instance
        # cluster rows carry object/material — see bridge.pack_geometry).
        from .scene.components import Renderable as _R
        mesh_uses = {}
        for _e, (r,) in scene.world.query(_R):
            mesh_uses[r.mesh_id] = mesh_uses.get(r.mesh_id, 0) + 1
        if any(m.tri_cluster is not None for m in self.meshes.meshes) or \
                any(v > 1 for v in mesh_uses.values()):
            self.settings.set("enableClod", True)

    def set_environment(self, env) -> None:
        """Set the IBL environment (reference: Renderer::SetEnvironment,
        Renderer.h:84). Accepts a models.environment.Environment, an
        equirect (H, W, 3) array, or the string 'procedural'."""
        from .models.environment import Environment
        import numpy as _np
        if isinstance(env, str):
            env = Environment.procedural()
        elif isinstance(env, _np.ndarray):
            env = Environment.precompute(env)
        self._environment = env
        self.settings.set("enableIBL", True)
        self._buffers = None

    @property
    def scene(self) -> Scene:
        assert self._scene is not None, "call set_current_scene first"
        return self._scene

    # -- config ------------------------------------------------------------
    def _build_config(self) -> FrameConfig:
        import jax
        s = self.settings
        w, h = s.get("renderResolution")
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        return FrameConfig(
            width=w, height=h,
            tile_h=s.get("tileSize")[0], tile_w=s.get("tileSize")[1],
            max_pairs=s.get("maxTrianglePairs"),
            enable_shadows=s.get("enableShadows"),
            num_cascades=s.get("numShadowCascades"),
            shadow_resolution=s.get("shadowResolution"),
            enable_clustered=s.get("enableClusteredLighting"),
            max_lights_per_cluster=s.get("maxLightsPerCluster"),
            enable_ibl=s.get("enableIBL"),
            enable_textures=s.get("enableTextures", False),
            enable_texture_streaming=s.get("enableTextureStreaming", False),
            tex_format=s.get("textureFormat", "rgba8"),
            tex_channels=self._live_tex_channels(),
            enable_bloom=s.get("enableBloom"),
            enable_gtao=s.get("enableGTAO"),
            enable_ssr=s.get("enableSSR"),
            enable_taa=s.get("enableTAA") or s.get("upscaleMode") == "taa",
            output_width=(s.get("outputResolution")[0]
                          if s.get("upscaleMode") == "taa" else 0),
            output_height=(s.get("outputResolution")[1]
                           if s.get("upscaleMode") == "taa" else 0),
            enable_skinning=s.get("enableSkinning"),
            enable_oit=s.get("enableOIT"),
            oit_layers=s.get("oitLayers"),
            enable_alpha_mask=any(m.alpha_cutoff >= 0.0
                                  for m in self.materials.materials),
            mask_peels=s.get("maskPeels", 1),
            enable_vertex_tangents=s.get("vertexTangents", False),
            max_shadow_lights=self._count_shadow_spots(),
            max_shadow_cubes=self._count_shadow_points(),
            enable_coat=any(m.coat_weight > 0.0
                            for m in self.materials.materials),
            enable_fuzz=any(m.fuzz_weight > 0.0
                            for m in self.materials.materials),
            enable_sss=any(m.subsurface_weight > 0.0
                           for m in self.materials.materials),
            enable_aniso=any(m.anisotropy_strength > 0.0
                             for m in self.materials.materials),
            enable_transmission=any(m.transmission_weight > 0.0
                                    for m in self.materials.materials),
            enable_energy_comp=s.get("enableEnergyCompensation", False),
            enable_auto_exposure=s.get("enableAutoExposure"),
            enable_vsm=s.get("enableVSM"),
            vsm_num_lights=s.get("vsmNumLights", 1),
            vsm_filter_taps=s.get("vsmFilterTaps", 1),
            vsm_rays=s.get("vsmRays", 0),
            vsm_ray_samples=s.get("vsmRaySamples", 3),
            vsm_slots=s.get("vsmSlots", 128),
            vsm_levels=s.get("vsmLevels", 6),
            enable_culling=s.get("enableFrustumCulling", True),
            enable_clod=s.get("enableClod"),
            enable_streaming=s.get("enableStreaming", False),
            streaming_priority=s.get("streamingPriorityMode", "max"),
            max_visible_clusters=s.get("maxVisibleClusters"),
            enable_occlusion=s.get("enableOcclusionCulling"),
            debug_view=s.get("debugView"),
            wireframe=s.get("wireframe", False),
            use_pallas_raster=on_tpu,
            enable_reyes=s.get("enableReyes", False),
            reyes_tris=s.get("reyesTriBudget", 512),
            reyes_dice=s.get("reyesDiceRate", 4),
            reyes_px=s.get("reyesPixelThreshold", 48.0),
            reyes_split_tris=s.get("reyesSplitBudget", 0),
            reyes_split_factor=s.get("reyesSplitFactor", 4.0),
            enable_voxel_rt=s.get("enableVoxelRT", False),
            enable_rt_reflect=s.get("enableRTReflections", False),
            enable_voxel_fallback=s.get("enableVoxelFallback", False),
            voxel_n=s.get("voxelResolution", 64),
            voxel_sggx=s.get("voxelSGGX", False),
            voxel_level_offsets=_vox_offsets(s.get("voxelResolution", 64)),
        )

    def _count_shadow_spots(self) -> int:
        """Shadow-casting spot lights (capped at 4 slots — each costs a
        shadow render + a full-screen shadowed shade)."""
        if self._scene is None:
            return 0
        from .graph.framedata import MAX_SHADOW_SPOT_SLOTS
        from .scene.components import Light, LightType
        n = sum(1 for _e, (l,) in self._scene.world.query(Light)
                if l.type == LightType.SPOT and l.cast_shadows)
        return min(n, MAX_SHADOW_SPOT_SLOTS)

    def _count_shadow_points(self) -> int:
        """Shadow-casting point lights (capped at 2 cubes — 6 face renders
        + a full-screen shadowed shade each)."""
        if self._scene is None:
            return 0
        from .graph.framedata import MAX_SHADOW_CUBE_SLOTS
        from .scene.components import Light, LightType
        n = sum(1 for _e, (l,) in self._scene.world.query(Light)
                if l.type == LightType.POINT and l.cast_shadows)
        return min(n, MAX_SHADOW_CUBE_SLOTS)

    def _live_tex_channels(self) -> tuple:
        """Channel samples the frame actually needs (unused ones cost
        nothing — they're dropped from the traced program)."""
        ms = self.materials.materials
        chans = []
        if any(m.base_color_texture >= 0 for m in ms):
            chans.append("base")
        if any(m.normal_texture >= 0 for m in ms):
            chans.append("normal")
        if any(m.metallic_roughness_texture >= 0 for m in ms):
            chans.append("mr")
        if any(m.emissive_texture >= 0 for m in ms):
            chans.append("emissive")
        return tuple(chans) or ("base",)

    def current_config(self) -> FrameConfig:
        if self._config is None or self.settings.generation != self._settings_generation:
            self._config = self._build_config()
            self._settings_generation = self.settings.generation
        return self._config

    def on_resize(self, width: int, height: int) -> None:
        self.settings.set("renderResolution", (width, height))

    # -- frame loop --------------------------------------------------------
    def update(self, dt: float = 1.0 / 60.0) -> None:
        """Host-side per-frame work (reference Renderer::Update,
        Renderer.cpp:1724): transforms, animation tick, buffer snapshot.

        With `enableSceneOverlap` on, the scene sync for frame N runs on a
        worker thread WHILE frame N-1's device work executes (the
        reference's ScheduleSceneUpdateTask / CommitCompletedSceneSnapshot
        pipeline, Renderer.cpp:597-741): this call commits the snapshot
        the worker produced last frame and schedules the next one, so the
        main thread pays only commit + dispatch. Contract (same as the
        reference's deferred-edit protocol): between update() calls, scene
        edits must go through `scene.world.defer(...)` — the worker
        flushes them at task start; direct edits race the worker."""
        assert self._bridge is not None
        if not self.settings.get("enableSceneOverlap", False):
            self._overlap_camera = None
            self._overlap_mats = None
            fut = self._update_future
            if fut is not None:        # toggle flipped off mid-run: drain
                fut.result()
                self._update_future = None
            self._update_sync(dt)
            return
        if self._update_future is None or self._buffers is None:
            self._update_sync(dt)      # bootstrap frame runs inline
        else:
            self.telemetry.begin_frame()
            self._time += dt
            with self.telemetry.stage("scene_commit"):
                fields, cam, mats = self._update_future.result()
                self._buffers = self._buffers.replace(**fields)
                self._overlap_camera = cam
                self._overlap_mats = mats
            self._post_snapshot_update()
        if self._update_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._update_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="scene-update")
        cfg = self.current_config()
        self._update_future = self._update_pool.submit(
            self._scene_update_task, self._time + dt,
            cfg.width / cfg.height)

    def _scene_update_task(self, t: float, aspect: float):
        """Worker-thread scene sync for the NEXT frame: deferred-edit
        flush, transform propagation, dynamic-field snapshot (device
        uploads happen here — JAX transfers are thread-safe), and the
        camera capture render() will use (so the main thread never reads
        the world while the next propagation runs)."""
        import jax.numpy as jnp
        self.scene.world.flush_deferred()
        self.scene.propagate_transforms()
        mats, nmats, bounds, ovalid = self._bridge.snapshot_objects()
        lights, num_lights, num_dir = self._bridge.snapshot_lights()
        fields = dict(
            joint_palette=jnp.asarray(
                self._bridge.snapshot_joint_palette(t)),
            object_mats=jnp.asarray(mats),
            object_normal_mats=jnp.asarray(nmats),
            object_bounds=jnp.asarray(bounds),
            object_valid=jnp.asarray(ovalid),
            lights=jnp.asarray(lights),
            num_lights=jnp.int32(num_lights),
            num_dir_lights=jnp.int32(num_dir),
        )
        cam = self.scene.camera_matrices(aspect=aspect)
        return fields, cam, mats.copy()

    def _update_sync(self, dt: float) -> None:
        """The synchronous update path (also the overlap bootstrap)."""
        self.telemetry.begin_frame()
        self._time += dt
        with self.telemetry.stage("scene_update"):
            self.scene.world.flush_deferred()
            self.scene.propagate_transforms()
        if self._buffers is None:
            env = getattr(self, "_environment", None)
            if env is not None:
                self._buffers = self._bridge.build_scene_buffers(
                    env_sh=env.sh, env_specular=env.spec_mips)
            else:
                self._buffers = self._bridge.build_scene_buffers()
        else:
            self._buffers = self._bridge.update_dynamic(self._buffers, self._time)
        self._post_snapshot_update()

    def _post_snapshot_update(self) -> None:
        """Main-thread per-frame work that consumes the committed snapshot
        (streamer bring-up, skinning enable, VSM invalidation, voxel
        rebuild). Runs with no worker in flight, so direct scene reads
        here are race-free."""
        # Geometry streaming: pool + feedback loop (models/streaming.py).
        if self.settings.get("enableStreaming", False) and \
                self._bridge.packed is not None and \
                getattr(self, "_streamer", None) is None:
            from .models.streaming import GeometryStreamer
            container = None
            cpath = self.settings.get("streamingContainer", "")
            if cpath:
                from .models.pageblob import PageBlobContainer
                container = PageBlobContainer(cpath)
            self._streamer = GeometryStreamer(
                self._bridge.packed, self.caps.max_groups,
                self.settings.get("streamingSlots"), container=container)
            sv, sdq, gs, gr = self._streamer.update(
                np.zeros(self.caps.max_groups, bool))
            self._buffers = self._buffers.replace(
                cluster_verts=sv, cluster_dequant=sdq,
                geom_slot=gs, group_resident=gr)
        # Texture streaming: disk container + feedback streamer
        # (models/texstream.py). With no container path configured, the
        # registry's atlas is serialized to the cache dir once — the
        # disk-backed memmap IS the streaming source either way.
        if self.settings.get("enableTextureStreaming", False) and \
                len(self.textures) and \
                getattr(self, "_tex_streamer", None) is None:
            from .models.texstream import (TextureStreamContainer,
                                           TextureStreamer,
                                           save_strip_container)
            cpath = self.settings.get("textureStreamContainer", "")
            if not cpath:
                import hashlib
                strips_np, flags_np = self.textures.strip_pyramid()
                h = hashlib.sha1(np.asarray(strips_np).tobytes())
                cdir = os.path.expanduser(
                    "~/.cache/basicrenderer_tpu/texstream")
                os.makedirs(cdir, exist_ok=True)
                cpath = os.path.join(cdir, h.hexdigest()[:16] + ".brts")
                if not os.path.exists(cpath):
                    save_strip_container(cpath, np.asarray(strips_np),
                                         np.asarray(flags_np),
                                         self.textures.resolution)
            self._tex_streamer = TextureStreamer(
                TextureStreamContainer(cpath),
                fine_row_budget=self.settings.get("textureFineRowBudget"))
            self._buffers = self._buffers.replace(
                tex_strips=self._tex_streamer.strips,
                tex_flags=self._tex_streamer.flags_device())
        # Auto-enable skinning when any packed instance is skinned.
        if self._bridge.packed and self._bridge.packed.skin_instances:
            self.settings.set("enableSkinning", True)
        # VSM page cache invalidation (reference: RenderTransformUpdated-tag
        # per-page invalidation, Renderer.cpp:1889-1895): moved objects dirty
        # only the clipmap pages their light-space footprint overlaps
        # (ops/vsm.invalidate_pages); light changes still drop the whole
        # cache (the light basis moves every page).
        if self.settings.get("enableVSM"):
            from .ops.motion import MAX_MOVING
            from .ops import vsm as vsm_ops
            mats, _n, bounds, _v = self._bridge.snapshot_objects()
            lights, _, _ = self._bridge.snapshot_lights()
            lh = hash(lights.tobytes())
            if lh != getattr(self, "_vsm_light_hash", None):
                self._vsm_state = None
            self._vsm_light_hash = lh
            pm = getattr(self, "_vsm_prev_mats", None)
            pb = getattr(self, "_vsm_prev_bounds", None)
            if pm is not None and pm.shape == mats.shape and \
                    getattr(self, "_vsm_state", None) is not None:
                moved = np.nonzero(
                    np.abs(mats - pm).max(axis=(1, 2)) > 1e-7)[0]
                if len(moved) > MAX_MOVING:
                    self._vsm_state = None   # mass motion: full drop
                elif len(moved):
                    spheres = np.full((MAX_MOVING, 4), -1.0, np.float32)
                    for i, o in enumerate(moved):
                        c0, r0 = pb[o, :3], pb[o, 3]
                        c1, r1 = bounds[o, :3], bounds[o, 3]
                        mid = (c0 + c1) * 0.5
                        rad = float(np.linalg.norm(c1 - c0)) * 0.5 \
                            + max(float(r0), float(r1))
                        spheres[i] = [*mid, rad]
                    import jax.numpy as jnp
                    st = self._vsm_state
                    cfg = self.current_config()
                    if isinstance(st, tuple):
                        self._vsm_state = tuple(
                            vsm_ops.invalidate_pages(
                                s, jnp.asarray(spheres),
                                jnp.asarray(lights[k, 4:7]), cfg)
                            for k, s in enumerate(st))
                    else:
                        self._vsm_state = vsm_ops.invalidate_pages(
                            st, jnp.asarray(spheres),
                            jnp.asarray(lights[0, 4:7]), cfg)
            self._vsm_prev_mats = mats.copy()
            self._vsm_prev_bounds = bounds.copy()
        # Voxel ray tier: (re)build the radiance pyramid when enabled and
        # the lights / object transforms it baked are stale (the analogue
        # of the reference's BLAS/TLAS refresh on residency change,
        # Renderer.cpp:2001-2007 — rebuilds are host-side and amortized).
        if self.settings.get("enableVoxelRT", False) or \
                self.settings.get("enableVoxelFallback", False):
            mats, _n, _b, _v = self._bridge.snapshot_objects()
            lights, _, _ = self._bridge.snapshot_lights()
            vh = hash((lights.tobytes(), mats.tobytes(),
                       self.settings.get("voxelResolution", 64)))
            if vh != getattr(self, "_voxel_hash", None):
                self._bridge.build_voxel_scene(
                    n=self.settings.get("voxelResolution", 64))
                self._voxel_hash = vh
                import jax.numpy as jnp
                vf = self._bridge._voxel_fields()
                self._buffers = self._buffers.replace(**vf)

    def render(self) -> Dict[str, Any]:
        """Dispatch the frame program (reference Renderer::Render,
        Renderer.cpp:1935). Returns the output pytree (device arrays)."""
        assert self._buffers is not None, "call update() first"
        config = self.current_config()
        if self._overlap_camera is not None:
            # Overlap mode: the NEXT frame's propagation may be running on
            # the worker — use the camera captured at commit time instead
            # of reading the live world.
            view_np, proj_np, cam_pos = self._overlap_camera
        else:
            view_np, proj_np, cam_pos = self.scene.camera_matrices(
                aspect=config.width / config.height)
        import jax.numpy as jnp
        vp_unjit = (proj_np @ view_np).astype(np.float32)
        if config.enable_taa:
            # Sub-pixel projection jitter (reference: m_jitter Renderer.h:223).
            from .ops import post as post_ops
            jx, jy = post_ops.taa_jitter(self._frame_index)
            proj_np = proj_np.copy()
            proj_np[0] += (2.0 * jx / config.width) * proj_np[3]
            proj_np[1] += (2.0 * jy / config.height) * proj_np[3]
        view = make_view(view_np, proj_np, cam_pos)
        params = self._frame_params()
        frame_fn = self._programs.get(config)
        args = [self._buffers, view, params]
        kwargs = {}
        if config.enable_occlusion or config.enable_taa:
            if getattr(self, "_prev_depth", None) is None or \
               self._prev_depth.shape != (config.padded_height, config.padded_width):
                self._prev_depth = jnp.zeros(
                    (config.padded_height, config.padded_width), jnp.float32)
            kwargs["prev_depth"] = self._prev_depth
        if config.enable_taa:
            hist = getattr(self, "_taa_history", None)
            oh = config.output_height or config.height
            ow = config.output_width or config.width
            if hist is None or hist.shape != (oh, ow, 3):
                hist = None
            kwargs["taa_history"] = hist
            # Motion-vector reprojection inputs (ops/motion.py): previous
            # camera + a budgeted list of objects whose transforms changed,
            # each with prev_viewproj @ prev_model @ inv(cur_model).
            from .ops.motion import MAX_MOVING
            prev_vp = getattr(self, "_prev_viewproj", None)
            if self._overlap_mats is not None:
                cur_mats = self._overlap_mats   # committed; world may be busy
            else:
                cur_mats, _nm, _b, _v = self._bridge.snapshot_objects()
            prev_mats = getattr(self, "_prev_object_mats", None)
            if prev_vp is not None and prev_mats is not None \
                    and prev_mats.shape == cur_mats.shape:
                rel = np.zeros((MAX_MOVING, 4, 4), np.float32)
                ids = np.full((MAX_MOVING,), -1, np.int32)
                moved = np.nonzero(
                    np.abs(cur_mats - prev_mats).max(axis=(1, 2)) > 1e-7)[0]
                for i, o in enumerate(moved[:MAX_MOVING]):
                    try:
                        inv_cur = np.linalg.inv(cur_mats[o])
                    except np.linalg.LinAlgError:
                        continue
                    rel[i] = prev_vp @ prev_mats[o] @ inv_cur
                    ids[i] = o
                kwargs["prev_viewproj"] = jnp.asarray(prev_vp)
                kwargs["moving_rel"] = jnp.asarray(rel)
                kwargs["moving_ids"] = jnp.asarray(ids)
            # Motion uses UN-jittered matrices both frames (the jitter is a
            # supersampling offset, not scene motion).
            self._prev_viewproj = vp_unjit
            self._prev_object_mats = cur_mats.copy()
        if config.enable_vsm:
            from .ops import vsm as vsm_ops
            # A geometry/light-count settings change obsoletes the cached
            # page state (different table/atlas shapes) — rebuild it.
            geom = (vsm_ops.geometry(config),
                    getattr(config, "vsm_num_lights", 1))
            if getattr(self, "_vsm_state", None) is None or \
                    getattr(self, "_vsm_geom", None) != geom:
                self._vsm_state = vsm_ops.init_states(config)
            self._vsm_geom = geom
            kwargs["vsm_state"] = self._vsm_state
        if config.enable_texture_streaming and \
                getattr(self, "_tex_streamer", None):
            # Pipelined sampler feedback (same pattern as geometry
            # streaming below): a completed worker tick's atlas state is
            # spliced in; the fetch + stream never block the frame.
            fut = getattr(self, "_tex_future", None)
            if fut is not None and fut.done():
                self._tex_future = None
                res = fut.result()
                if res is not None:
                    strips, flags = res
                    self._buffers = self._buffers.replace(
                        tex_strips=strips, tex_flags=flags)
                    args[0] = self._buffers
        if config.enable_streaming and getattr(self, "_streamer", None):
            # Pipelined GPU feedback (reference: the fenced N-frames-later
            # readback, CLodStreamingSystem.cpp:1091-1195): the device->host
            # feedback fetch AND the page-pool update run on a worker
            # thread; the frame thread only splices a COMPLETED tick's pool
            # state — and only when that tick actually loaded or evicted
            # (a steady-state frame pays nothing).
            fut = getattr(self, "_stream_future", None)
            if fut is not None and fut.done():
                self._stream_future = None
                res = fut.result()
                if res is not None:
                    sv, sdq, gs, gr = res
                    self._buffers = self._buffers.replace(
                        cluster_verts=sv,
                        cluster_dequant=sdq, geom_slot=gs, group_resident=gr)
                    args[0] = self._buffers
        with self.telemetry.stage("dispatch"):
            out = frame_fn(*args, **kwargs)
        if config.enable_streaming and getattr(self, "_streamer", None) \
                and getattr(self, "_stream_future", None) is None:
            td = out.get("touched_groups")
            if td is not None:
                # Stage the device->host copy, then fetch + stream on the
                # worker. At most one tick in flight; ticks therefore run
                # every ~fetch-latency frames, which is the reference's
                # frames-in-flight feedback cadence.
                try:
                    td.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
                self._stream_future = self._feedback_pool().submit(
                    self._stream_tick, td)
        if config.enable_texture_streaming and \
                getattr(self, "_tex_streamer", None) and \
                getattr(self, "_tex_future", None) is None:
            wd = out.get("tex_wanted")
            if wd is not None:
                try:
                    wd.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
                self._tex_future = self._feedback_pool().submit(
                    self._tex_tick, wd)
        self.telemetry.record_frame_outputs(out)
        self.telemetry.end_frame()
        if config.enable_occlusion or config.enable_taa:
            self._prev_depth = out["depth_padded"]
        if config.enable_taa:
            self._taa_history = out["taa_out"]
        if config.enable_vsm:
            self._vsm_state = out["vsm_state"]
        self._frame_index += 1
        return out

    # -- streaming feedback workers -----------------------------------------
    def _feedback_pool(self):
        """Single-thread worker for feedback fetch + pool updates: ticks
        for one streamer are serialized; geometry and texture ticks may
        interleave (they touch disjoint state)."""
        pool = getattr(self, "_fb_pool", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="feedback")
            self._fb_pool = pool
        return pool

    def _stream_tick(self, touched_dev):
        """Worker-thread geometry streaming tick: fetch the feedback
        (blocking is fine here — we're off the frame path), run the page
        pool, and return new device tables only when residency changed."""
        st = self._streamer
        t = np.asarray(touched_dev)
        loads0, ev0 = st.loads, st.evictions
        res = st.update(t)
        if st.loads == loads0 and st.evictions == ev0:
            return None
        return res

    def _tex_tick(self, wanted_dev):
        st = self._tex_streamer
        w = np.asarray(wanted_dev)
        loads0 = st.loads
        res = st.update(w)
        if st.loads == loads0:
            return None
        return res

    def render_to_numpy(self) -> np.ndarray:
        """Render + sync: returns the (H, W, 3) uint8 image."""
        return np.asarray(self.render()["image"])

    def render_async(self, keys=("image",)):
        """Render + async readback (reference: ReadbackManager's fenced
        path): dispatches the frame, stages the device->host DMA, and
        returns a concurrent.futures.Future resolving to {key: np.ndarray}
        on the readback worker — the caller's thread never blocks on the
        fetch. At most 3 readbacks are in flight (frames-in-flight
        backpressure); results resolve in request order."""
        out = self.render()
        rb = getattr(self, "_readback", None)
        if rb is None:
            from .utils.readback import ReadbackManager
            rb = self._readback = ReadbackManager(max_in_flight=3)
        return rb.request({k: out[k] for k in keys if k in out})

    def _frame_params(self) -> FrameParams:
        import jax.numpy as jnp
        s = self.settings
        return FrameParams(
            exposure=jnp.float32(s.get("exposure")),
            bloom_intensity=jnp.float32(s.get("bloomIntensity")),
            bloom_threshold=jnp.float32(s.get("bloomThreshold")),
            ibl_intensity=jnp.float32(s.get("iblIntensity")),
            shadow_bias=jnp.float32(s.get("shadowBias")),
            sky_intensity=jnp.float32(s.get("skyIntensity")),
            taa_blend=jnp.float32(s.get("taaBlend")),
            gtao_radius=jnp.float32(s.get("gtaoRadius")),
            gtao_intensity=jnp.float32(s.get("gtaoIntensity")),
            clod_error_px=jnp.float32(s.get("clodErrorPx")),
            frame_index=jnp.int32(self._frame_index),
            light_size=float(s.get("lightSize", 0.03)),
        )

"""Generate the static Go1 model data module from the Unitree go1.urdf.

Run offline (the generated file is committed):

    python tools/gen_go1_model.py [path/to/go1.urdf]

Parses the URDF robot description (an asset, reference
``resources/robots/go1/urdf/go1.urdf``) into the 13-body kinematic tree used
by the TPU engine:

    body 0:      trunk ("base"), with the imu link's fixed mass merged in
    bodies 1-12: (hip, thigh, calf) x (FR, FL, RR, RL), the foot link's fixed
                 mass merged into its calf (the reference keeps feet as
                 separate bodies only for contact reporting; we report foot
                 contacts separately via contact-sphere report slots).

Also emits the collision-sphere decomposition of the URDF collision
primitives (box/cylinder/sphere) used for heightfield contact.
"""

import sys
import xml.etree.ElementTree as ET

import numpy as np

LEGS = ["FR", "FL", "RR", "RL"]
SEGS = ["hip", "thigh", "calf"]


def _vec(s, default="0 0 0"):
    return np.array([float(x) for x in (s or default).split()])


def parse_urdf(path):
    tree = ET.parse(path)
    root = tree.getroot()
    links, joints = {}, {}
    for link in root.findall("link"):
        name = link.get("name")
        inertial = link.find("inertial")
        data = {"mass": 0.0, "com": np.zeros(3), "inertia": np.zeros((3, 3)), "collisions": []}
        if inertial is not None:
            data["mass"] = float(inertial.find("mass").get("value"))
            origin = inertial.find("origin")
            data["com"] = _vec(origin.get("xyz") if origin is not None else None)
            it = inertial.find("inertia")
            ixx, iyy, izz = (float(it.get(k)) for k in ("ixx", "iyy", "izz"))
            ixy, ixz, iyz = (float(it.get(k)) for k in ("ixy", "ixz", "iyz"))
            data["inertia"] = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
        for col in link.findall("collision"):
            origin = col.find("origin")
            xyz = _vec(origin.get("xyz") if origin is not None else None)
            rpy = _vec(origin.get("rpy") if origin is not None else None)
            geom = col.find("geometry")
            for g in geom:
                data["collisions"].append((g.tag, dict(g.attrib), xyz, rpy))
        links[name] = data
    for joint in root.findall("joint"):
        name = joint.get("name")
        origin = joint.find("origin")
        j = {
            "type": joint.get("type"),
            "parent": joint.find("parent").get("link"),
            "child": joint.find("child").get("link"),
            "xyz": _vec(origin.get("xyz") if origin is not None else None),
        }
        axis = joint.find("axis")
        j["axis"] = _vec(axis.get("xyz")) if axis is not None else np.zeros(3)
        limit = joint.find("limit")
        if limit is not None:
            j["lower"] = float(limit.get("lower", "0"))
            j["upper"] = float(limit.get("upper", "0"))
            j["effort"] = float(limit.get("effort", "0"))
            j["velocity"] = float(limit.get("velocity", "0"))
        joints[name] = j
    return links, joints


def rpy_to_mat(rpy):
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def merge_fixed(parent, child_offset, child):
    """Merge a fixed child link's inertial into the parent link frame."""
    m1, c1, I1 = parent["mass"], parent["com"], parent["inertia"]
    m2, c2, I2 = child["mass"], child_offset + child["com"], child["inertia"]
    m = m1 + m2
    if m == 0:
        return parent
    com = (m1 * c1 + m2 * c2) / m

    def shift(I, mm, d):
        return I + mm * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

    I = shift(I1, m1, c1 - com) + shift(I2, m2, c2 - com)
    return {"mass": m, "com": com, "inertia": I, "collisions": parent["collisions"]}


def sphere_decomposition(body_name, collisions):
    """Approximate URDF collision primitives with spheres (body frame)."""
    spheres = []
    for tag, attrib, xyz, rpy in collisions:
        R = rpy_to_mat(rpy)
        if tag == "sphere":
            spheres.append((xyz, float(attrib["radius"])))
        elif tag == "cylinder":
            # hip cylinders: single sphere at center
            spheres.append((xyz, float(attrib["radius"])))
        elif tag == "box":
            size = np.array([float(x) for x in attrib["size"].split()])
            order = np.argsort(-size)
            long_axis = np.zeros(3)
            long_axis[order[0]] = 1.0
            long_len = size[order[0]]
            r = 0.5 * size[order[1]]  # second-largest half-extent
            n = max(2, int(np.ceil(long_len / (2.0 * max(r, 0.02)))))
            n = min(n, 4)
            ts = np.linspace(-0.5 * (long_len - 2 * r), 0.5 * (long_len - 2 * r), n)
            axis_world = R @ long_axis
            if body_name == "trunk":
                # two rows of spheres to cover the trunk box width
                short_axis = np.zeros(3)
                short_axis[order[1]] = 1.0
                w_off = (R @ short_axis) * (0.5 * size[order[1]] - r * 0.5)
                for t in ts:
                    spheres.append((xyz + t * axis_world + w_off, r))
                    spheres.append((xyz + t * axis_world - w_off, r))
            else:
                for t in ts:
                    spheres.append((xyz + t * axis_world, r))
    return spheres


def main():
    urdf = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/resources/robots/go1/urdf/go1.urdf"
    links, joints = parse_urdf(urdf)

    body_names = ["base"]
    parents = [-1]
    joint_pos = [np.zeros(3)]  # joint origin in parent body frame (base: unused)
    joint_axes = [np.zeros(3)]
    dof_names = []
    lowers, uppers, efforts, velocities = [], [], [], []

    trunk = links["trunk"]
    # merge imu into trunk
    trunk = merge_fixed(trunk, joints["imu_joint"]["xyz"], links["imu_link"])
    bodies = [trunk]

    foot_offsets = {}
    for leg in LEGS:
        for si, seg in enumerate(SEGS):
            jname = f"{leg}_{seg}_joint"
            j = joints[jname]
            link = dict(links[f"{leg}_{seg}"])
            if seg == "calf":
                fo = joints[f"{leg}_foot_fixed"]["xyz"]
                link = merge_fixed(link, fo, links[f"{leg}_foot"])
                foot_offsets[leg] = fo
            body_names.append(f"{leg}_{seg}")
            parents.append(0 if si == 0 else len(bodies) - 1)
            joint_pos.append(j["xyz"])
            joint_axes.append(j["axis"])
            dof_names.append(jname)
            lowers.append(j["lower"]); uppers.append(j["upper"])
            efforts.append(j["effort"]); velocities.append(j["velocity"])
            bodies.append(link)

    nb = len(bodies)
    mass = np.array([b["mass"] for b in bodies])
    com = np.stack([b["com"] for b in bodies])
    inertia = np.stack([b["inertia"] for b in bodies])

    # ---- collision spheres ----
    # report slots: 0..12 = dynamics bodies, 13..16 = feet (FR, FL, RR, RL)
    sphere_body, sphere_offset, sphere_radius, sphere_report = [], [], [], []
    for bi, name in enumerate(body_names):
        link_name = "trunk" if name == "base" else name
        for off, r in sphere_decomposition(link_name, links[link_name]["collisions"]):
            sphere_body.append(bi); sphere_offset.append(off)
            sphere_radius.append(r); sphere_report.append(bi)
    for li, leg in enumerate(LEGS):
        calf_idx = body_names.index(f"{leg}_calf")
        foot = links[f"{leg}_foot"]
        for off, r in sphere_decomposition(f"{leg}_foot", foot["collisions"]):
            sphere_body.append(calf_idx)
            sphere_offset.append(foot_offsets[leg] + off)
            sphere_radius.append(r)
            sphere_report.append(nb + li)

    def fmt(a):
        return np.array2string(
            np.asarray(a), separator=", ", precision=12, suppress_small=False,
            threshold=10_000, max_line_width=100,
        )

    out = f'''"""Static Go1 model data — GENERATED by tools/gen_go1_model.py. Do not edit.

Kinematic tree, inertials and collision-sphere decomposition extracted from
the Unitree go1.urdf robot description (reference
resources/robots/go1/urdf/go1.urdf; fixed links merged, feet kept as contact
report slots 13-16 in order FR, FL, RR, RL).
"""

import numpy as np

NUM_BODIES = {nb}
NUM_DOF = {len(dof_names)}

BODY_NAMES = {body_names!r}
DOF_NAMES = {dof_names!r}
FOOT_REPORT_SLOTS = [{nb}, {nb + 1}, {nb + 2}, {nb + 3}]  # FR, FL, RR, RL
NUM_REPORT_BODIES = {nb + 4}

PARENT = np.array({parents!r}, dtype=np.int32)

# joint origin in the parent body frame; row 0 is the floating base (unused)
JOINT_POS = np.array({fmt(np.stack(joint_pos))})

# revolute joint axis in the child body frame; row 0 unused
JOINT_AXIS = np.array({fmt(np.stack(joint_axes))})

DOF_LOWER = np.array({fmt(lowers)})
DOF_UPPER = np.array({fmt(uppers)})
DOF_EFFORT = np.array({fmt(efforts)})
DOF_VEL_LIMIT = np.array({fmt(velocities)})

MASS = np.array({fmt(mass)})

COM = np.array({fmt(com)})

# rotational inertia about the body COM, in the body frame
INERTIA = np.array({fmt(inertia)})

# collision spheres: body index, offset in body frame, radius, report slot
SPHERE_BODY = np.array({sphere_body!r}, dtype=np.int32)
SPHERE_OFFSET = np.array({fmt(np.stack(sphere_offset))})
SPHERE_RADIUS = np.array({fmt(sphere_radius)})
SPHERE_REPORT = np.array({sphere_report!r}, dtype=np.int32)

# foot contact spheres (for foot position/velocity queries): index into sphere
# arrays, order FR, FL, RR, RL
FOOT_SPHERE_IDX = np.array(
    [{", ".join(str(i) for i, r in enumerate(sphere_report) if r >= nb)}], dtype=np.int32)
'''
    path = "legged_tracking_tpu/physics/go1_model_data.py"
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: {nb} bodies, {len(dof_names)} dofs, {len(sphere_body)} spheres")
    print("total mass:", mass.sum())


if __name__ == "__main__":
    main()
